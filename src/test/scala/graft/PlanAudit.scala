package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan auditor: `Test/runMain graft.PlanAudit <sfDir> <query>...`
  * prints the formatted physical plan of the named SparkEntry queries —
  * the "is this the plan you'd want" loop (shuffle count, pushed filters,
  * WholeStageCodegen spans) without running the query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        println(s"[audit] $n exchanges=$exchanges")
      } catch {
        case e: Exception => println(s"[audit] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
