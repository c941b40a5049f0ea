package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named SparkEntry queries once each.
  * Usage: QueryTime <sfDir> <cores> <query>[,<query>...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1).toInt
    val names = args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"QT $n rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
