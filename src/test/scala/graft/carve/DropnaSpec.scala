package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** `Config.dropna = false` — the reference's `ProcessingConfig(dropna=False)`
  * (`tests/carvers/test_nan_vs_values.py`): NaN can never be merged into a
  * bin and stays RAW in the transform output (`Features.unfillna`), but the
  * all-values-vs-NaN split is still tested for viability when the non-NaN
  * search finds nothing on its own — informative missingness keeps the
  * feature, uninformative missingness drops it.
  */
class DropnaSpec extends SparkSuite {
  import spark.implicits._

  /** nNan null rows + nVal "A" rows, y built from exact positive counts. */
  private def exactBinary(nNan: Int, nVal: Int, nanRate: Double, valRate: Double) = {
    val nanPos = math.round(nanRate * nNan).toInt
    val valPos = math.round(valRate * nVal).toInt
    val rows =
      (0 until nNan).map(i => (null.asInstanceOf[String], if (i < nanPos) 1 else 0)) ++
        (0 until nVal).map(i => ("A", if (i < valPos) 1 else 0))
    rows.toDF("feature", "y")
  }

  private val cfg = BinaryCarver.Config(minFreq = 0.05, maxNMod = 4, dropna = false)
  private val spec = Seq(BinaryCarver.FeatureSpec("feature", "categorical"))

  test("dropna=false: informative missingness kept, NaN left raw in the output") {
    val df = exactBinary(1000, 1000, nanRate = 0.8, valRate = 0.2)
    val m = BinaryCarver.fit(df, "y", spec, config = cfg)
    assert(m.kept.map(_.name) == Vector("feature"), m.features.map(f => (f.name, f.droppedReason)))
    val f = m.kept.head
    assert(f.hasNan && f.nanBin < 0, s"NaN must not own a bin: nanBin=${f.nanBin}")
    val out = m.transform(df, keepOriginal = true)
    assert(out.filter(col("feature").isNull && col("feature_bin").isNull).count() == 1000,
      "all 1000 NaN rows keep a raw null code")
    assert(out.filter(col("feature").isNotNull).select("feature_bin").distinct().count() == 1)
  }

  test("dropna=false: uninformative missingness dropped (all-vs-NaN split fails distinct rates)") {
    val df = exactBinary(1000, 1000, nanRate = 0.5, valRate = 0.5)
    val m = BinaryCarver.fit(df, "y", spec, config = cfg)
    assert(m.kept.isEmpty, m.kept.map(_.name))
    // the failed [[A], [NaN]] candidate is in the history, non-viable
    val h = m.features.head.history
    assert(h.nonEmpty && !h.exists(_.viable))
  }

  test("dropna=false: equal-rate modalities merge into ONE group, NaN split off raw") {
    // A, B, C share the target rate exactly; NaN differs -> before the
    // reference's nan-vs-values fix this dropped untested
    val rows =
      (0 until 500).map(i => (null.asInstanceOf[String], if (i < 350) 1 else 0)) ++
        Seq("A", "B", "C").flatMap(v => (0 until 500).map(i => (v, if (i < 150) 1 else 0)))
    val df = rows.toDF("feature", "y")
    val m = BinaryCarver.fit(df, "y", spec, config = cfg)
    assert(m.kept.map(_.name) == Vector("feature"), m.features.map(f => (f.name, f.droppedReason)))
    val out = m.transform(df, keepOriginal = true)
    assert(out.filter(col("feature").isNull && col("feature_bin").isNull).count() == 500)
    assert(out.filter(col("feature").isNotNull).select("feature_bin").distinct().count() == 1)
  }

  test("dropna=false: quantitative constant-plus-NaN kept via the all-vs-NaN split, NaN raw") {
    val rows =
      (0 until 1000).map(i => (null.asInstanceOf[java.lang.Double], if (i < 800) 1 else 0)) ++
        (0 until 1000).map(i => (java.lang.Double.valueOf(1.0), if (i < 200) 1 else 0))
    val df = rows.toDF("x", "y")
    val m = BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")), config = cfg)
    assert(m.kept.map(_.name) == Vector("x"), m.features.map(f => (f.name, f.droppedReason)))
    val out = m.transform(df, keepOriginal = true)
    assert(out.filter(col("x").isNull && col("x_bin").isNull).count() == 1000)
    assert(out.filter(col("x").isNotNull).select("x_bin").distinct().count() == 1)
  }

  test("dropna=false model JSON round-trips and transforms identically") {
    val df = exactBinary(400, 400, nanRate = 0.8, valRate = 0.2)
    val m = BinaryCarver.fit(df, "y", spec, config = cfg)
    val m2 = Json.readModel(m.toJson)
    val a = m.transform(df, keepOriginal = true).select("feature", "feature_bin").collect().toSeq
    val b = m2.transform(df, keepOriginal = true).select("feature", "feature_bin").collect().toSeq
    assert(a == b)
    val f2 = m2.kept.head
    assert(f2.hasNan && f2.nanBin < 0)
  }

  test("dropna=false threads into the reference artifact for EVERY feature") {
    // the reference sets feature._dropna=False for every feature fitted
    // under ProcessingConfig(dropna=False) — including features with no
    // observed NaN, where the old nanBin-inference wrote dropna:true and a
    // reference-side reload would then fillna new NaNs instead of leaving
    // them raw
    val rows =
      (0 until 400).map(i => (null.asInstanceOf[String], "P", if (i < 320) 1 else 0)) ++
        (0 until 400).map(i => ("A", "P", if (i < 80) 1 else 0)) ++
        (0 until 400).map(i => ("B", "Q", if (i < 300) 1 else 0))
    val df = rows.toDF("with_nan", "no_nan", "y")
    val specs = Seq(BinaryCarver.FeatureSpec("with_nan", "categorical"),
      BinaryCarver.FeatureSpec("no_nan", "categorical"))
    val m = BinaryCarver.fit(df, "y", specs, config = cfg)
    assert(m.features.forall(!_.fitDropna))
    val json = RefJson.write(m)
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    import org.json4s._
    assert((parsed \ "config" \ "dropna") == JBool(false))
    m.kept.foreach { f =>
      assert((parsed \ "features" \ f.name \ "dropna") == JBool(false),
        s"${f.name} must serialize dropna:false under a dropna=false fit")
    }
    // engine-JSON round-trip carries the flag, and a re-export agrees
    val m2 = Json.readModel(m.toJson)
    assert(m2.features.forall(!_.fitDropna))
    // the dropna=true default still writes true
    val mT = BinaryCarver.fit(df, "y", specs, config = cfg.copy(dropna = true))
    val parsedT = org.json4s.jackson.JsonMethods.parse(RefJson.write(mT))
    assert((parsedT \ "config" \ "dropna") == JBool(true))
    mT.kept.foreach { f =>
      assert((parsedT \ "features" \ f.name \ "dropna") == JBool(true))
    }
  }

  test("dropna=true default unchanged: informative missingness earns NaN its own bin") {
    val df = exactBinary(1000, 1000, nanRate = 0.8, valRate = 0.2)
    val m = BinaryCarver.fit(df, "y", spec, config = cfg.copy(dropna = true))
    val f = m.kept.head
    assert(f.nanBin >= 0)
    val out = m.transform(df, keepOriginal = true)
    assert(out.select("feature_bin").distinct().count() == 2)
    assert(out.filter(col("feature_bin").isNull).count() == 0)
  }
}
