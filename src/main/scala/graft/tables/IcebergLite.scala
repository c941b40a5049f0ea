package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg-style table layer over Parquet (SURVEY.md §7.6 — no Iceberg
  * runtime jar ships with this Spark; coursier is offline).
  *
  * Layout:
  * ```
  * <table>/data/part_ts=YYYY-MM-DD/…parquet   — range-partitioned data
  * <table>/metadata/manifest-<n>.json          — schema + per-partition stats
  * <table>/metadata/current                    — pointer to live manifest
  * <table>/checkpoints/<stage>-<hash>.json     — per-stage lineage (E6)
  * ```
  * Snapshots are append-only: each write produces manifest-<n+1> with a
  * parent pointer, so readers pin a snapshot id and a killed writer never
  * corrupts the current snapshot (the pointer flips last, atomically via
  * temp-file + move). The API mirrors `spark.read` / `writeTo` semantics so
  * a real Iceberg catalog can be swapped in later.
  */
object IcebergLite {

  final case class PartitionStat(partition: String, rows: Long)
  final case class Manifest(
      snapshotId: Long,
      parentId: Long,
      schemaJson: String,
      partitionCol: String,
      partitions: Vector[PartitionStat],
      totalRows: Long
  )

  private def metaDir(table: String): Path = Paths.get(table, "metadata")
  private def dataDir(table: String): String = s"$table/data"

  def currentManifest(table: String): Option[Manifest] = {
    val ptr = metaDir(table).resolve("current")
    if (!Files.exists(ptr)) None
    else Some(readManifest(metaDir(table).resolve(Files.readString(ptr).trim)))
  }

  private def readManifest(p: Path): Manifest = {
    val j = JsonMethods.parse(Files.readString(p))
    implicit val fmts: Formats = DefaultFormats
    Manifest(
      (j \ "snapshot_id").extract[Long],
      (j \ "parent_id").extract[Long],
      JsonMethods.compact(JsonMethods.render(j \ "schema")),
      (j \ "partition_col").extract[String],
      (j \ "partitions") match {
        case JArray(xs) => xs.map(x =>
          PartitionStat((x \ "partition").extract[String], (x \ "rows").extract[Long])).toVector
        case _ => Vector.empty
      },
      (j \ "total_rows").extract[Long]
    )
  }

  /** Write (overwrite or append) a snapshot of `df` partitioned by the
    * date of `tsCol` — the coarse range partitioning every temporal read
    * prunes on.
    */
  def write(df: DataFrame, table: String, tsCol: String = "warc_ts", mode: String = "overwrite"): Manifest = {
    val withPart = df.withColumn("part_ts", date_format(col(tsCol), "yyyy-MM-dd"))
    withPart.write.mode(mode).partitionBy("part_ts").parquet(dataDir(table))

    val spark = df.sparkSession
    val stats = spark.read.parquet(dataDir(table))
      .groupBy(col("part_ts").cast("string").as("part_ts"))
      .agg(count(lit(1)).as("rows"))
      .collect()
      .map(r => PartitionStat(r.getString(0), r.getLong(1)))
      .sortBy(_.partition)
      .toVector
    val parent = currentManifest(table).map(_.snapshotId).getOrElse(0L)
    val snapshotId = parent + 1
    val m = Manifest(snapshotId, parent, df.schema.json, "part_ts", stats, stats.map(_.rows).sum)
    Files.createDirectories(metaDir(table))
    val name = s"manifest-$snapshotId.json"
    val json: JValue =
      ("snapshot_id" -> m.snapshotId) ~ ("parent_id" -> m.parentId) ~
      ("schema" -> JsonMethods.parse(m.schemaJson)) ~
      ("partition_col" -> m.partitionCol) ~
      ("partitions" -> m.partitions.map(p => ("partition" -> p.partition) ~ ("rows" -> p.rows))) ~
      ("total_rows" -> m.totalRows)
    Files.writeString(metaDir(table).resolve(name), JsonMethods.pretty(JsonMethods.render(json)))
    // atomic pointer flip: temp + move
    val tmp = metaDir(table).resolve("current.tmp")
    Files.writeString(tmp, name)
    Files.move(tmp, metaDir(table).resolve("current"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    m
  }

  /** Read the current snapshot. Partition pruning on `part_ts` is free:
    * a filter on the ts column's date reaches the directory listing.
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    require(currentManifest(table).nonEmpty, s"no current snapshot in $table")
    spark.read.parquet(dataDir(table)).drop("part_ts")
  }

  // -------------------------------------------------------- checkpoints (E6)

  /** Per-stage lineage record: content-addressed by (stage, snapshot,
    * config hash) so resume is only valid against identical inputs.
    */
  final case class Checkpoint(stage: String, snapshotId: Long, configHash: String, payload: String)

  private def ckptPath(table: String, stage: String, snapshotId: Long, configHash: String): Path =
    Paths.get(table, "checkpoints", s"$stage-$snapshotId-$configHash.json")

  def saveCheckpoint(table: String, c: Checkpoint): Unit = {
    val p = ckptPath(table, c.stage, c.snapshotId, c.configHash)
    Files.createDirectories(p.getParent)
    val json: JValue = ("stage" -> c.stage) ~ ("snapshot_id" -> c.snapshotId) ~
      ("config_hash" -> c.configHash) ~ ("payload" -> c.payload)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(json)))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def loadCheckpoint(table: String, stage: String, snapshotId: Long, configHash: String): Option[String] = {
    val p = ckptPath(table, stage, snapshotId, configHash)
    if (!Files.exists(p)) None
    else {
      val j = JsonMethods.parse(Files.readString(p))
      j \ "payload" match {
        case JString(s) => Some(s)
        case _ => None
      }
    }
  }

  def listCheckpoints(table: String): Vector[String] = {
    val d = Paths.get(table, "checkpoints")
    if (!Files.exists(d)) Vector.empty
    else Files.list(d).iterator().asScala.map(_.getFileName.toString).filterNot(_.endsWith(".tmp")).toVector.sorted
  }

  def configHash(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** Durable derived-frame cache: if `table` carries a marker matching
    * `config`'s hash AND its data directory exists, the cached parquet is
    * read back; otherwise `produce(dataPath)` writes it and the marker is
    * stamped AFTER the write (a crash mid-produce leaves no marker, so the
    * next run regenerates). Shared by the minhash/embedding signature
    * checkpoints — at corpus scale a derived frame this size belongs in a
    * table, not executor-local block storage.
    *
    * INVALIDATION CONTRACT: freshness is decided by `config` ALONE — the
    * produced data is NOT fingerprinted (that is what makes resume cheap:
    * a rerun must not rescan the source to prove the cache valid). Callers
    * whose `produce` depends on input data must fold a dataset identity
    * (source path, snapshot id, row count, a caller tag) into `config`,
    * or use a distinct `table` per dataset.
    */
  def cachedParquet(spark: SparkSession, table: String, config: String)
      (produce: String => Unit): org.apache.spark.sql.DataFrame = {
    val hash = configHash(config)
    val dir = Paths.get(table)
    val marker = dir.resolve("_CKPT_CONFIG")
    val dataPath = s"$table/data"
    val fresh = Files.exists(marker) && Files.exists(Paths.get(dataPath)) &&
      Files.readString(marker).trim == hash
    if (!fresh) {
      produce(dataPath)
      Files.createDirectories(dir)
      Files.writeString(marker, hash)
    }
    spark.read.parquet(dataPath)
  }
}
