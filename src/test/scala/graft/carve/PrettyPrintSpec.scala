package graft.carve

import graft.SparkSuite

/** HTML fit summaries (reference `carvers/utils/pretty_print.py`):
  * per-bin frequency + target rate tables with a coolwarm gradient.
  */
class PrettyPrintSpec extends SparkSuite {

  private lazy val model = {
    import spark.implicits._
    val df = (0 until 400).map { i =>
      (i % 100 / 10.0, if (i % 100 > 60) 1 else 0)
    }.toDF("x", "y")
    BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")),
      config = BinaryCarver.Config(minFreq = 0.1, maxNMod = 3))
  }

  test("featureHtml renders labels, 4-decimal stats and gradient colors") {
    val f = model.kept.head
    val html = PrettyPrint.featureHtml(f, caption = "x on train")
    assert(html.startsWith("<table style='display:inline'>"))
    assert(html.contains("<caption>x on train</caption>"))
    assert(html.contains("<th>label</th><th>frequency</th><th>target_rate</th>"))
    f.binLabels.foreach(l => assert(html.contains(
      l.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")), l))
    // 4-decimal precision on every rate cell
    f.rates.foreach(r => assert(html.contains(f"${r.rate}%.4f")))
    // the min rate paints cool (blue-ish), the max warm (red-ish)
    assert(html.contains("background-color:rgb(59,76,192)"))
    assert(html.contains("background-color:rgb(180,4,38)"))
  }

  test("hideIndex drops the index column (dev-distribution mode)") {
    val f = model.kept.head
    val html = PrettyPrint.featureHtml(f, hideIndex = true)
    assert(!html.contains("<th>0</th>"))
    assert(PrettyPrint.featureHtml(f).contains("<th>0</th>"))
  }

  test("modelHtml emits one captioned table per feature") {
    val html = PrettyPrint.modelHtml(model)
    assert(html.contains("<h3>Carved features (target=y"))
    assert(html.contains("cramerv="))
    assert(html.count(_ == '<') > 10)
  }

  test("coolwarm clamps and hits the endpoints/midpoint") {
    assert(PrettyPrint.coolwarm(0.0) == "rgb(59,76,192)")
    assert(PrettyPrint.coolwarm(1.0) == "rgb(180,4,38)")
    assert(PrettyPrint.coolwarm(0.5) == "rgb(221,221,221)")
    assert(PrettyPrint.coolwarm(-3.0) == PrettyPrint.coolwarm(0.0))
    assert(PrettyPrint.coolwarm(9.0) == PrettyPrint.coolwarm(1.0))
  }
}
