package graft.select

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SelectorSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    val rows = (0 until 2000).map { i =>
      val signal = (i % 100).toDouble
      val noise = ((i * 2654435761L) % 1000).toDouble / 1000.0
      val copy = signal * 2 + 1 // perfectly redundant with signal
      val cat = s"c${i % 4}"
      val catNoise = s"n${(i * 7919) % 5}"
      val constant = 1.0
      val y = if (signal / 100.0 + noise * 0.2 > 0.55) 1 else 0
      (i.toLong, signal, copy, noise, constant, cat, catNoise, y)
    }
    rows.toDF("id", "signal", "copy", "noise", "constant", "cat", "cat_noise", "y")
  }

  test("quantitative metrics: signal ranks above noise, constant gated") {
    val sel = Selector.select(df, "y",
      quants = Seq("signal", "copy", "noise", "constant"), quals = Nil,
      config = Selector.Config(nBest = 2))
    val keptNames = sel.kept.map(_.name)
    // signal and copy tie on |corr| (copy = 2*signal+1): exactly one survives,
    // the other is redundancy-dropped
    assert(keptNames.count(Set("signal", "copy")) == 1, sel.kept.toString)
    assert(!keptNames.contains("constant"))
    assert(sel.dropped.exists { case (m, r) => m.name == "constant" && r == "constant" })
    assert(sel.dropped.exists { case (m, r) =>
      Set("signal", "copy")(m.name) && r.startsWith("redundant_with")
    }, sel.dropped.toString)
  }

  test("qualitative metrics: associated categorical beats noise categorical") {
    val withSignalCat = df.withColumn("cat_sig", concat(lit("s"), col("y").cast("string")))
    val sel = Selector.select(withSignalCat, "y", quants = Nil,
      quals = Seq("cat", "cat_noise", "cat_sig"),
      config = Selector.Config(nBest = 1))
    assert(sel.kept.map(_.name) == Vector("cat_sig"), sel.kept.toString)
  }

  test("budget caps per kind and spearman is computed") {
    val m = Selector.quantitativeMetrics(df, "y", Seq("signal", "noise"))
    assert(m("signal").association > m("noise").association)
    assert(!m("signal").spearman.isNaN)
    val sel = Selector.select(df, "y", Seq("signal", "noise"), Nil,
      Selector.Config(nBest = 1, redundancyThreshold = 0.99))
    assert(sel.kept.length == 1)
    assert(sel.dropped.exists(_._2 == "budget"))
  }
}
