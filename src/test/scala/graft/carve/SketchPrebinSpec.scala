package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Sketch prebin path (SURVEY.md §7.4): a quantitative column whose
  * cardinality exceeds the threshold is pre-bucketized scan-side into its
  * approxQuantile buckets, so the collected histogram stays O(q) and the
  * maxHistogramRows guard never trips.
  */
class SketchPrebinSpec extends SparkSuite {
  import spark.implicits._

  test("high-cardinality column carves end-to-end without tripping the guard") {
    // 400k rows, ~400k distinct continuous values; y depends on x
    val n = 400000
    val df = spark.range(n.toLong)
      .withColumn("x", col("id").cast("double") + pmod(hash(col("id")).cast("double"), lit(1000.0)) / lit(1000.0))
      .withColumn("y", (col("id") >= n / 2).cast("int"))
    // without the sketch, the exact histogram would be ~400k rows > guard
    intercept[IllegalArgumentException] {
      BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")),
        config = BinaryCarver.Config(maxHistogramRows = 100000, sketchCardinalityThreshold = 0))
    }
    val m = BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")),
      config = BinaryCarver.Config(maxHistogramRows = 100000, sketchCardinalityThreshold = 50000))
    val f = m.kept.head
    assert(f.nBins >= 2 && f.nBins <= 5)
    // the step signal at id = n/2 must be recovered: rates monotone, and the
    // split edge within sketch tolerance of the midpoint
    val rates = f.rates.map(_.rate)
    assert(rates == rates.sorted, rates.toString)
    assert(rates.head < 0.05 && rates.last > 0.95, rates.toString)
    // transform bins all rows, no nulls
    val out = m.transform(df, keepOriginal = true)
    assert(out.filter(col("x_bin").isNull).count() == 0)
    // bin populations from the transform match the fitted counts (scan-side
    // bucketize and driver-side histogram agree)
    val got = out.groupBy("x_bin").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    f.rates.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(got(i) - r.count) <= 1e-6 * n, s"bin $i: ${got(i)} vs ${r.count}")
    }
  }

  test("low-cardinality columns keep the exact histogram path") {
    val df = (0 until 5000).map(i => ((i % 40).toDouble, i % 2)).toDF("x", "y")
    val sketched = BinaryCarver.sketchHighCardinality(df, Seq(BinaryCarver.FeatureSpec("x", "quantitative")),
      BinaryCarver.Config(sketchCardinalityThreshold = 1000))
    assert(sketched.isEmpty)
  }
}
