package graft.temporal

import graft.SparkSuite
import graft.pages.PageGen
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("skew-salted range repartition balances a Zipf-skewed key (E7)") {
    val pages = PageGen.pages(spark, 20000, nHosts = 30)
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
    val hot = Temporal.hotKeys(pages, "host", shareThreshold = 0.05, sampleFraction = 0.3)
    assert(hot.nonEmpty, "Zipf table must have detectable hot hosts")

    def partitionSizes(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.groupBy(spark_partition_id()).count().select("count").as[Long].collect()

    val unsalted = pages.repartition(8, col("host"))
    val salted = Temporal.skewSaltedRepartitionByRange(pages, "warc_ts", "host", 8, saltBuckets = 8)
    val (uMax, uAvg) = { val s = partitionSizes(unsalted); (s.max.toDouble, s.sum.toDouble / s.length) }
    val (sMax, sAvg) = { val s = partitionSizes(salted); (s.max.toDouble, s.sum.toDouble / s.length) }
    // salting must reduce the max/avg imbalance of the hash layout
    assert(sMax / sAvg < uMax / uAvg, f"salted ${sMax / sAvg}%.2f vs unsalted ${uMax / uAvg}%.2f")
    assert(sMax / sAvg < 1.5, f"salted skew still ${sMax / sAvg}%.2f")
  }
}
