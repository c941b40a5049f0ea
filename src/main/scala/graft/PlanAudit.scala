package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit: prints formatted physical plans of the flagship paths so
  * scan pruning / broadcast / codegen coverage is reviewable offline.
  * `PlanAudit <sfDir>`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    show("q2_join_agg (broadcast check)", SparkEntry.queries("q2_join_agg")(spark, sfDir))
    show("q_token_count (scan pruning + codegen)", SparkEntry.queries("q_token_count")(spark, sfDir))
    show("q_asof_join (one-shuffle union+window)", SparkEntry.queries("q_asof_join")(spark, sfDir))
    // carve transform plan: fit on the fly then show the scoring projection
    val m = {
      import graft.carve.BinaryCarver
      val df = graft.tables.Tables.documents(spark, sfDir)
        .withColumn("y", when(col("n_chars") > 300, lit(1)).otherwise(lit(0)))
      BinaryCarver.fit(df, "y", Seq(
        BinaryCarver.FeatureSpec("n_chars", "quantitative"),
        BinaryCarver.FeatureSpec("lang", "categorical")))
    }
    show("carve transform (pure projection)",
      m.transform(graft.tables.Tables.documents(spark, sfDir)))
    // nested transform: direct probe + X4 parent walk must stay a pure
    // projection (compiled hash probes, no shuffle, one codegen span)
    val nm = {
      import graft.carve.BinaryCarver
      val df = graft.tables.Tables.documents(spark, sfDir)
        .withColumn("fine", concat_ws("_", col("source"), col("lang")))
        .withColumn("y", when(col("n_chars") > 300, lit(1)).otherwise(lit(0)))
      BinaryCarver.fit(df, "y",
        Seq(BinaryCarver.FeatureSpec("fine", "nested", parents = Seq("source"))),
        config = BinaryCarver.Config(minFreq = 0.04))
    }
    show("nested transform (direct probe + parent walk, pure projection)",
      nm.transform(graft.tables.Tables.documents(spark, sfDir)
        .withColumn("fine", concat_ws("_", col("source"), col("lang")))))
    spark.stop()
  }
}
