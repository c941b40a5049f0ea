package graft.select

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Selector measure zoo (F2) + outlier gates (F3). */
class SelectorMeasuresSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    val rows = (0 until 3000).map { i =>
      val signal = (i % 100).toDouble
      val noise = ((i * 2654435761L) % 997).toDouble / 997.0
      val outliery = if (i % 100 == 0) 1000.0 else noise // 1% extreme outliers
      val y = if (signal / 100.0 + noise * 0.2 > 0.55) 1 else 0
      (i.toLong, signal, noise, outliery, y)
    }
    rows.toDF("id", "signal", "noise", "outliery", "y")
  }

  test("distance measure (F2): exactly -pearson, NaN on constant") {
    val d = Selector.distanceByFeature(df, "y", Seq("signal", "noise"))
    val q = Selector.quantitativeMetrics(df, "y", Seq("signal", "noise"))
    // distance correlation of the reference = scipy correlation distance - 1
    // = (1 - r) - 1 = -r
    assert(math.abs(d("signal") + q("signal").association) < 1e-12 ||
      math.abs(d("signal")) == q("signal").association) // association stores |r|
    assert(d("signal") < 0) // signal correlates positively with y -> -r < 0
    val const = df.withColumn("c", lit(1.0))
    assert(Selector.distanceByFeature(const, "y", Seq("c"))("c").isNaN)
  }

  test("kruskal H: signal >> noise; effect sizes bounded") {
    val k = Selector.kruskalByFeature(df, "y", Seq("signal", "noise"))
    assert(k("signal").h > k("noise").h)
    assert(k("signal").epsilonSq > 0.3 && k("signal").epsilonSq <= 1.0)
    assert(k("noise").epsilonSq < 0.05)
    assert(k("signal").etaSq >= 0 && k("signal").etaSq <= 1.0)
  }

  test("kruskal H matches closed form on a tiny known case") {
    // groups: y=0 -> {1,2,3}, y=1 -> {4,5,6}: perfect separation, no ties
    val t = Seq((1.0, 0), (2.0, 0), (3.0, 0), (4.0, 1), (5.0, 1), (6.0, 1)).toDF("x", "y")
    val h = Selector.kruskalByFeature(t, "y", Seq("x"))("x").h
    // ranks 1..6, R0=6, R1=15, H = 12/(6*7)*(36/3+225/3)-3*7 = 12/42*87-21
    val expected = 12.0 / 42.0 * (36.0 / 3 + 225.0 / 3) - 21.0
    assert(math.abs(h - expected) < 1e-9, s"$h vs $expected")
  }

  test("R measure: sqrt of between/total variance ratio") {
    val t = Seq((1.0, 0), (2.0, 0), (3.0, 0), (11.0, 1), (12.0, 1), (13.0, 1)).toDF("x", "y")
    val r = Selector.rMeasure(t, "y", Seq("x"))("x")
    // means 2 and 12, grand 7; bss = 3*25+3*25=150; tss = 150 + within 4 = 154
    val expected = math.sqrt(150.0 / 154.0)
    assert(math.abs(r - expected) < 1e-9, s"$r vs $expected")
    // constant feature -> NaN
    val c = Seq((1.0, 0), (1.0, 1)).toDF("x", "y")
    assert(Selector.rMeasure(c, "y", Seq("x"))("x").isNaN)
  }

  test("outlier rates: planted 1% extremes detected by both gates") {
    val o = Selector.outlierRates(df, Seq("noise", "outliery"))
    assert(o("noise").zscoreRate == 0.0)
    assert(math.abs(o("outliery").zscoreRate - 0.01) < 0.002, o.toString)
    assert(o("outliery").iqrRate >= 0.009, o.toString)
  }

  test("outlier gate drops the outliery feature in select()") {
    val sel = Selector.select(df, "y", quants = Seq("signal", "outliery"), quals = Nil,
      config = Selector.Config(maxZscoreOutlierRate = Some(0.005)))
    assert(sel.kept.map(_.name) == Vector("signal"))
    assert(sel.dropped.exists { case (m, r) => m.name == "outliery" && r.startsWith("zscore_outliers") })
  }
}
