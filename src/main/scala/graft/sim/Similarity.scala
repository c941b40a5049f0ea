package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  *  - [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set,
  *    one scan over the corpus, per-query heap via window rank. The
  *    baseline and the verifier for the approximate paths.
  *  - [[lshTopK]] — random-hyperplane LSH: sign-bit signature buckets the
  *    corpus so each query only scores its own bucket(s). The scale path:
  *    corpus shuffles once on bucket id; queries broadcast.
  *
  * All arithmetic is double-precision, column-expressed (`zip_with` +
  * `aggregate` — codegen'd higher-order functions, no UDF).
  */
object Similarity {

  /** Dot product of two array<double> columns, left-to-right summation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol: array<float|double>) corpus table
    * @param queries subset of the same shape; must be small enough to
    *                broadcast (the per-query fan-out is corpus-sized)
    */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Deterministic random hyperplanes: nBits × dim doubles from splitmix64,
    * mapped to (-1, 1) uniformly. Pure, reproducible across JVMs.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        val h = graft.dedup.Dedup.mix64(seed + b.toLong * 65537L + d)
        // top 53 bits → [0,1) → [-1,1)
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def signBucket(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var out = 0L
    var b = 0
    while (b < planes.length) {
      var s = 0.0
      val p = planes(b)
      var i = 0
      val n = math.min(p.length, vec.length)
      while (i < n) { s += p(i) * vec(i); i += 1 }
      if (s > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** LSH-bucketed approximate top-k: score each query only against corpus
    * vectors in the same sign-bucket — or, with `probes > 0`, in any bucket
    * within Hamming distance `probes` of the query's (standard multiprobe:
    * a near neighbor falling on the far side of one or two hyperplanes is
    * recovered without adding tables). The corpus still shuffles ONCE on
    * its own bucket id; only the small broadcast query side fans out
    * (sum_{i<=probes} C(nBits, i) probe rows per query).
    * Recall is measured against [[bruteTopK]] in tests.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8,
      seed: Long = 42L,
      probes: Int = 0
  ): DataFrame = {
    require(probes >= 0 && probes <= 2, "probes in 0..2 (fan-out grows combinatorially)")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    // codegen sign-bucket expression (bands=1 of nBits planes — identical
    // keys to the former signBucket UDF, no UDF boxing on the corpus scan)
    def bucketCol(v: org.apache.spark.sql.Column) =
      element_at(graft.transform.SignBandKeys.column(v, 1, nBits, dim, seed), 1)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
      .withColumn("bucket", bucketCol(col("nvec")))
    val q0 = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("bucket", bucketCol(col("qvec")))
    val q =
      if (probes == 0) q0
      else {
        val flips = Seq(0L) ++
          (0 until nBits).map(b => 1L << b) ++
          (if (probes >= 2)
             for { a <- 0 until nBits; b <- a + 1 until nBits } yield (1L << a) | (1L << b)
           else Seq.empty)
        q0.withColumn("bucket",
          explode(array(flips.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      }
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Embedding near-duplicate pairs — the corpus-vs-corpus self-join the
    * 100 TB embedding-dedup path needs. Same shuffle discipline as the
    * MinHash LSH: `bands` sign-signatures of `bitsPerBand` hyperplanes
    * each; the band shuffle carries `(band, key, id)` only; intra-bucket
    * pairs (capped at `maxBucket`) dedup across bands; vectors join back
    * once per distinct pair for the exact cosine, filtered at `minCosine`.
    * Recall rises with more bands (any single agreeing band emits the
    * pair); measured against [[bruteTopK]] in tests.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.9,
      bands: Int = 16,
      bitsPerBand: Int = 8,
      maxBucket: Int = 1000,
      seed: Long = 42L,
      // optional durable (id, vec) table: at corpus scale prefer it over
      // executor-local persist — survives executor loss, and a killed run
      // resumes without re-reading/re-casting the source embeddings.
      // INVALIDATION CONTRACT: the table is keyed by config + datasetTag,
      // NOT the input data (that is what makes resume cheap) — reusing one
      // table path across different corpora serves stale vectors unless
      // datasetTag identifies the input (source path, snapshot id, ...).
      vecCheckpoint: Option[String] = None,
      datasetTag: String = ""
  ): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val vecs = vecCheckpoint match {
      case Some(table) =>
        graft.tables.IcebergLite.cachedParquet(df.sparkSession, table, s"embvecs:v1:$datasetTag") { dataPath =>
          df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
            .write.mode("overwrite").parquet(dataPath)
        }
      case None =>
        df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // codegen banded sign-signature (identical keys to the former UDF)
    val banded = vecs
      .select(col("id"), posexplode(
        graft.transform.SignBandKeys.column(col("vec"), bands, bitsPerBand, dim, seed))
        .as(Seq("band", "key")))
    // cap membership BEFORE aggregation: the row_number window spills per
    // partition, whereas a post-collect_list slice would first gather the
    // ENTIRE bucket into one in-memory aggregation buffer — OOM on a
    // degenerate bucket (e.g. a mass of identical boilerplate embeddings).
    // Keeps the maxBucket smallest ids, same semantics as the old slice.
    val wBucket = Window.partitionBy(col("band"), col("key")).orderBy(col("id").asc)
    val capped = banded
      .withColumn("__rn", row_number().over(wBucket))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    val buckets = capped
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairArr = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
        struct(x.as("id_a"), y.as("id_b")))))
    val cand = buckets.select(explode(pairArr).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
  }
}
