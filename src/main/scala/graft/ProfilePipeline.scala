package graft

import org.apache.spark.sql.SparkSession
import java.sql.Timestamp

import graft.pages.PagePipeline
import graft.tables.IcebergLite
import graft.temporal.Temporal
import graft.carve.BinaryCarver

/** Stage-level wall profile of the bench pipeline (driver-fixed vs
  * parallel work): `ProfilePipeline <cores> <table>`. Prints one line per
  * stage; used to chase the scaling-gate fixed-cost budget, not shipped
  * into any artifact.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val table = args(1)
    val asOf = Timestamp.valueOf("2024-06-01 00:00:00")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROFILE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm (JIT) — full pipeline once
    timed("warm_full_pipeline")(Bench.pipelineOnce(spark, table, asOf))

    // measured, stage by stage (mirrors fitCheckpointed's hist stage)
    val ckpt = java.nio.file.Paths.get(table, "checkpoints")
    if (java.nio.file.Files.exists(ckpt))
      java.nio.file.Files.list(ckpt).forEach(p => java.nio.file.Files.delete(p))

    val config = BinaryCarver.Config()
    val pages = timed("read+manifest") {
      IcebergLite.currentManifest(table).get
      IcebergLite.read(spark, table)
    }
    val guarded = Temporal.leakageGuard(pages, "warc_ts", asOf)
    val scanOnly = PagePipeline.scanFrame(guarded)
    val sketchSpecs = PagePipeline.specs.filter(s => scanOnly.columns.contains(s.name))
    val sketched = timed("sketch_gate+quantiles") {
      BinaryCarver.sketchHighCardinality(scanOnly, sketchSpecs,
        config.copy(sketchCardinalityThreshold = math.min(config.sketchCardinalityThreshold, 100000L)))
    }
    val train = PagePipeline.featureFrame(guarded).withColumn("y", PagePipeline.label)
    val hist = timed("histogram_pass") {
      BinaryCarver.histogram(train, "y", PagePipeline.specs, sketched)
    }
    println(s"PROF hist_rows ${hist.values.map(_.length).sum}")
    val histJson = timed("hist_json_roundtrip") {
      val j = graft.pages.HistJson.write(hist)
      graft.pages.HistJson.read(j)
    }
    val model = timed("driver_fit_dp") {
      BinaryCarver.fitFromHistograms(histJson, None, "y", PagePipeline.specs, config)
    }
    timed("model_json_roundtrip") {
      graft.carve.Json.readModel(model.toJson)
    }
    timed("transform_count") {
      PagePipeline.transform(spark, table, model).count()
    }
    timed("full_pipeline_again") (Bench.pipelineOnce(spark, table, asOf))
    spark.stop()
  }
}
