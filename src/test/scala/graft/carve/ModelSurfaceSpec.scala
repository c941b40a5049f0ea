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

  test("moveValue: partial move NaNs both bins, whole-bin move aggregates exactly") {
    val f = model.kept.find(_.name == "catnum").get
    assume(f.nBins >= 2)
    // pick a value in a bin with company (partial move) if one exists
    val binsBySize = f.valueToBin.groupBy(_._2).view.mapValues(_.keys.toVector).toMap
    binsBySize.find(_._2.length >= 2) match {
      case Some((srcBin, members)) =>
        val toBin = (0 until f.nBins).find(_ != srcBin).get
        val moved = model.moveValue("catnum", members.head, toBin)
        val mf = moved.kept.find(_.name == "catnum").get
        assert(mf.valueToBin(members.head) == toBin)
        assert(mf.rates(srcBin).rate.isNaN && mf.rates(toBin).rate.isNaN)
        // untouched bins keep their statistics
        (0 until mf.nBins).filterNot(b => b == srcBin || b == toBin)
          .foreach(b => assert(!mf.rates(b).rate.isNaN))
        // transform routes the moved value to its new bin
        val out = moved.transform(df, keepOriginal = true)
        val v = members.head.toDouble
        assert(out.filter(col("catnum") === v).select("catnum_bin").head().getInt(0) == toBin)
      case None => cancel("fixture has no multi-member bin")
    }
  }

  test("ungroupValue: extracts into a new NaN-stat singleton bin") {
    val f = model.kept.find(_.name == "catnum").get
    val multi = f.valueToBin.groupBy(_._2).find(_._2.size >= 2)
    assume(multi.nonEmpty)
    val value = multi.get._2.keys.head
    val un = model.ungroupValue("catnum", value)
    val uf = un.kept.find(_.name == "catnum").get
    assert(uf.nBins == f.nBins + 1)
    assert(uf.valueToBin(value) == f.nBins) // appended at the end
    assert(uf.rates.last.rate.isNaN)
    assert(uf.binLabels.last == value)
    // already-alone value is a no-op
    val alone = un.kept.find(_.name == "catnum").get.valueToBin
    assert(un.ungroupValue("catnum", value).kept.find(_.name == "catnum").get.valueToBin == alone)
  }

  test("splitBin: interval splits at the cut, halves get NaN stats, transform follows") {
    val f = model.kept.find(_.name == "x").get
    val (lo, hi) = {
      val idxs = f.prebinToBin.zipWithIndex.collect { case (b, p) if b == 0 => p }
      (if (idxs.min == 0) Double.NegativeInfinity else f.prebinEdges(idxs.min - 1),
        if (idxs.max >= f.prebinEdges.length) Double.PositiveInfinity else f.prebinEdges(idxs.max))
    }
    // a cut strictly inside bin 0 on an existing prebin edge boundary
    val at = f.prebinEdges.find(e => e > lo && e < hi).getOrElse(cancel("no inner edge"))
    val sp = model.splitBin("x", 0, at)
    val sf = sp.kept.find(_.name == "x").get
    assert(sf.nBins == f.nBins + 1)
    assert(sf.rates(0).rate.isNaN && sf.rates(1).rate.isNaN)
    assert(!sf.rates(2).rate.isNaN)
    assert(sf.binLabels(0).endsWith(s"${fmtLike(at)}]"), sf.binLabels(0))
    // rows at/below the cut -> bin 0, above (within the old bin) -> bin 1
    val out = sp.transform(df, keepOriginal = true)
    assert(out.filter(col("x") <= at && col("x") > lo).select("x_bin").distinct().head().getInt(0) == 0)
    val above = out.filter(col("x") > at && col("x") <= hi).select("x_bin").distinct().collect().map(_.getInt(0))
    assert(above.toSet == Set(1), above.mkString(","))
    // invalid cut rejected
    intercept[IllegalArgumentException](model.splitBin("x", 0, hi + 1))
  }

  test("setBinBoundary: boundary moves against the next bin, both NaN") {
    val f = model.kept.find(_.name == "x").get
    assume(f.nBins >= 2)
    val idxs0 = f.prebinToBin.zipWithIndex.collect { case (b, p) if b == 0 => p }
    val hi0 = f.prebinEdges(idxs0.max)
    // shrink bin 0 to an inner prebin edge
    val inner = f.prebinEdges.zipWithIndex
      .collectFirst { case (e, p) if p < idxs0.max && (p == 0 || f.prebinToBin(p) == 0) && e < hi0 => e }
      .getOrElse(cancel("no inner edge in bin 0"))
    val mv = model.setBinBoundary("x", 0, inner)
    val mf = mv.kept.find(_.name == "x").get
    assert(mf.nBins == f.nBins)
    assert(mf.rates(0).rate.isNaN && mf.rates(1).rate.isNaN)
    val out = mv.transform(df, keepOriginal = true)
    assert(out.filter(col("x") > inner && col("x") <= hi0).select("x_bin").distinct().head().getInt(0) == 1)
    // last bin's +inf bound is immovable
    intercept[IllegalArgumentException](model.setBinBoundary("x", f.nBins - 1, 1.0))
  }

  private def fmtLike(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else f"$d%.6g"

  test("history: every tested candidate recorded, winner last and viable") {
    val f = model.kept.find(_.name == "x").get
    assert(f.history.nonEmpty, "history should be recorded by default")
    // the walk stops at the first viable candidate: exactly one viable
    // entry, and it is the last one
    assert(f.history.count(_.viable) == 1)
    assert(f.history.last.viable)
    assert(f.history.last.info.startsWith("Best for"))
    assert(f.history.init.forall(h => h.info == "Not viable"))
    // the winning combination matches the fitted bins
    assert(f.history.last.nMod == f.nBins)
    // history frame shape
    val h = model.history(spark)
    assert(h.columns.toSeq == Seq("feature", "rank", "combination", "cramerv", "tschuprowt",
      "measure", "value", "n_mod", "viable", "min_freq_ok", "distinct_rates_ok",
      "ordering_ok", "dropna", "info"))
    assert(h.filter(col("feature") === "x").count() == f.history.length.toLong)
    // opt-out
    val noHist = BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")),
      config = BinaryCarver.Config(history = false))
    assert(noHist.kept.head.history.isEmpty)
  }

  test("history: all carver families record the tested candidates with their measure") {
    val cdf = df.withColumn("yc", col("x") * 2.0 + col("catnum"))
    val cm = ContinuousCarver.fit(cdf, "yc", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    val ch = cm.kept.head.history
    assert(ch.nonEmpty && ch.last.viable && ch.last.measure == "kruskal" && !ch.last.value.isNaN)

    val odf = df.withColumn("yo", lit(1) + (col("x") > 33).cast("int") + (col("x") > 66).cast("int"))
    val om = OrdinalCarver.fit(odf, "yo", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    val oh = om.kept.head.feature.history
    assert(oh.nonEmpty && oh.last.viable && oh.last.measure == "tau_c")

    val mdf = df.withColumn("ym", when(col("x") > 66, "hi").when(col("x") > 33, "mid").otherwise("lo"))
    val mm = MulticlassCarver.fit(mdf, "ym", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    val mh = mm.kept.head.feature.history
    assert(mh.nonEmpty && mh.last.viable && mh.last.measure == "tschuprowt" && !mh.last.tschuprowt.isNaN)
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
