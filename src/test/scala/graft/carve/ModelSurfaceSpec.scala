package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Model API surface: summary bookkeeping, manual bin grouping, X5
  * check_values raise mode, T1 numeric-categorical stringification, and the
  * stability view of ordinal/multiclass models.
  */
class ModelSurfaceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    val rows = (0 until 3000).map { i =>
      val x = (i % 100).toDouble
      val catNum = (i % 4).toDouble // numeric-typed categorical
      val y = if (x > 60) 1 else 0
      (x, catNum, y)
    }
    rows.toDF("x", "catnum", "y")
  }

  private lazy val model = BinaryCarver.fit(df, "y", Seq(
    BinaryCarver.FeatureSpec("x", "quantitative"),
    BinaryCarver.FeatureSpec("catnum", "categorical")))

  test("T1: numeric categorical values stringify like the reference (2.0 -> \"2\")") {
    val f = model.kept.find(_.name == "catnum").get
    assert(f.valueToBin.keySet.forall(k => !k.contains(".")), f.valueToBin.keySet.toString)
    // and transform maps the numeric column through the same normalization
    val out = model.transform(df, keepOriginal = true)
    assert(out.filter(col("catnum_bin").isNull).count() == 0)
  }

  test("summary: one row per bin, counts sum to N") {
    val s = model.summary(spark)
    assert(s.columns.toSeq == Seq("feature", "kind", "cramerv", "tschuprowt", "label",
      "content", "rate", "frequency", "count", "dropped", "dropped_reason"))
    val xCount = s.filter(col("feature") === "x").agg(sum("count")).head().getLong(0)
    assert(xCount == 3000L)
  }

  test("groupBins: merging two bins renumbers and recombines correctly") {
    // three target-rate plateaus (0, 1/2, 1) force a >=3-bin optimum —
    // the shared step-function fixture carves to exactly 2 bins and would
    // leave this path untested
    val df3 = (0 until 3000).map { i =>
      val x = (i % 100).toDouble
      val y = if (x > 66) 1 else if (x > 33) i % 2 else 0
      (x, y)
    }.toDF("x", "y")
    // cramerv: Tschuprow's sqrt(r-1) denominator would still prefer the
    // 2-bin merge of the 0- and 1/2-rate plateaus
    val model3 = BinaryCarver.fit(df3, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")),
      config = BinaryCarver.Config(sortBy = "cramerv"))
    val f = model3.kept.find(_.name == "x").get
    assert(f.nBins >= 3, s"fixture must carve to >=3 bins, got ${f.nBins}")
    val merged = model3.groupBins("x", 0, 1)
    val mf = merged.kept.find(_.name == "x").get
    assert(mf.nBins == f.nBins - 1)
    assert(mf.rates(0).count == f.rates(0).count + f.rates(1).count)
    // transform agrees: old bins 0 and 1 both map to new bin 0
    val out = merged.transform(df3, keepOriginal = true)
    val bins = out.select("x_bin").distinct().collect().map(_.getInt(0)).sorted
    assert(bins.toVector == (0 until mf.nBins).toVector, bins.mkString(","))
    // populations match the merged rates
    val got = out.groupBy("x_bin").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    mf.rates.zipWithIndex.foreach { case (r, i) => assert(got(i) == math.round(r.count)) }
  }

  test("X5 check_values: unseen categorical raises when no default bucket") {
    // catnum has no rare values -> no OTHER bucket
    val f = model.kept.find(_.name == "catnum").get
    assume(f.otherBin < 0)
    val withUnseen = Seq((5.0, 9.0, 0)).toDF("x", "catnum", "y")
    val ex = intercept[Exception] {
      model.transform(withUnseen, keepOriginal = true, checkValues = true).collect()
    }
    assert(ex.getMessage.contains("check_values") || ex.getCause != null)
    // default mode: unseen -> null bin, no raise
    val ok = model.transform(withUnseen, keepOriginal = true).select("catnum_bin").head()
    assert(ok.isNullAt(0))
  }

  test("stability view: ordinal model drift report via binaryView") {
    val odf = df.withColumn("yo", lit(1) + (col("x") > 33).cast("int") + (col("x") > 66).cast("int"))
    val om = OrdinalCarver.fit(odf, "yo", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    val shifted = odf.filter(col("x") > 20)
    val report = graft.stability.Stability.evaluate(om.binaryView, shifted, "yo")
    assert(report.features.nonEmpty)
    assert(report.features.head.psiValue > 0)
  }
}
