package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Writes `explain("formatted")` of every declared query (and the
  * plan-relevant internal dedup frames) to one file per query:
  * `PlanDump <sfDir> <outDir> <suffix>` → `<outDir>/<name>_<suffix>.txt`.
  * Used to commit the before/after plan evidence for optimization rounds
  * (plans/r07/...); queries whose result is a driver-built local frame
  * still dump (their plan is a LocalTableScan — the cluster work happens
  * inside the fit and is evidenced by job counts instead).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    def dump(name: String, mk: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val p = mk.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), p)
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    val docs = graft.tables.Tables.documents(spark, sfDir)
    dump("drop_exact_duplicates",
      graft.dedup.Dedup.dropExactDuplicates(docs, "doc_id", "text"))
    // the short-text exact path inside nearDupComponents (extracted as
    // shortTextEdges in r7; reconstructed inline when dumping older trees)
    dump("short_text_edges", {
      val m = graft.dedup.Dedup.getClass.getMethods.find(_.getName == "shortTextEdges")
      m match {
        case Some(meth) =>
          meth.invoke(graft.dedup.Dedup, docs, "doc_id", "text", Integer.valueOf(5))
            .asInstanceOf[org.apache.spark.sql.DataFrame]
        case None => // pre-r7 shape, quoted from Dedup.nearDupComponents as shipped
          val normText = trim(lower(col("text")))
          val wShort = org.apache.spark.sql.expressions.Window
            .partitionBy(md5(normText.cast("binary")))
          docs.filter(col("text").isNotNull && length(normText) < 5)
            .select(col("doc_id").as("id_b"), min(col("doc_id")).over(wShort).as("id_a"))
            .filter(col("id_a") =!= col("id_b"))
            .select(col("id_a"), col("id_b"))
      }
    })
    dump("minhash_candidate_pairs",
      graft.dedup.Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      dump(name, fn(spark, sfDir))
    }
    spark.stop()
  }
}
