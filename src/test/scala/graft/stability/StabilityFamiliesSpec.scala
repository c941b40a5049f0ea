package graft.stability

import graft.SparkSuite
import graft.carve.{BinaryCarver, ContinuousCarver, MulticlassCarver, OrdinalCarver}
import org.apache.spark.sql.functions._

/** M4: stability monitoring for the non-binary carver families — each
  * model's NEW-sample rates are recomputed with its own fitted rate
  * reference (ridit marginal / CA axis / mean), mirroring
  * `stability/report.py:106-228` + `combinations/utils/target_rate.py`.
  */
class StabilityFamiliesSpec extends SparkSuite {
  import spark.implicits._

  // x in 0..99 with three plateaus; rich enough for every target family
  private lazy val df = {
    val rows = (0 until 6000).map { i =>
      val x = (i % 100).toDouble
      val noise = ((i * 2654435761L) % 97).toDouble / 97.0
      val yc = x * 2.0 + noise * 15.0
      val yo = 1 + (x / 25).toInt.min(3)               // ordinal 1..4
      val ym = if (x < 33) "lo" else if (x < 66) "mid" else "hi"
      (i.toLong, x, yc, yo, ym)
    }
    rows.toDF("id", "x", "yc", "yo", "ym").cache()
  }

  private val spec = Seq(BinaryCarver.FeatureSpec("x", "quantitative"))

  test("ordinal model: stable on itself, drifted sample flagged with rate deltas") {
    val om = OrdinalCarver.fit(df, "yo", spec)
    assert(om.kept.nonEmpty)
    assert(om.kept.head.rateRef != null)
    val same = Stability.evaluateOrdinal(om, df, "yo")
    assert(same.features.nonEmpty)
    val fs = same.features.head
    // identical sample: tiny PSI, rate deltas ~0, not unstable
    assert(fs.psiValue < 0.01, fs.toString)
    assert(fs.rateDelta.forall(d => math.abs(d) < 1e-9), fs.rateDelta.toString)
    assert(!fs.unstable, fs.reasons.toString)
    // population shifted toward high x: PSI fires
    val drifted = Stability.evaluateOrdinal(om, df.filter(col("x") > 55), "yo")
    assert(drifted.features.head.unstable, drifted.features.head.toString)
  }

  test("multiclass model: CA-axis rates comparable across samples; unseen class raises") {
    val mm = MulticlassCarver.fit(df, "ym", spec)
    assert(mm.kept.nonEmpty && mm.kept.head.rateRef != null)
    val same = Stability.evaluateMulticlass(mm, df, "ym")
    val fs = same.features.head
    assert(fs.psiValue < 0.01)
    assert(fs.rateDelta.forall(d => math.abs(d) < 1e-9), fs.rateDelta.toString)
    assert(!fs.unstable, fs.reasons.toString)
    val drifted = Stability.evaluateMulticlass(mm, df.filter(col("x") > 55), "ym")
    assert(drifted.features.head.unstable)
    intercept[IllegalArgumentException] {
      Stability.evaluateMulticlass(mm, df.withColumn("ym", lit("new_class")), "ym")
    }
  }

  test("continuous model: Welch drift p-values from stored per-bin stds") {
    val cm = ContinuousCarver.fit(df, "yc", spec,
      config = BinaryCarver.Config(sortBy = "kruskal"))
    val f = cm.kept.head
    assert(f.stds.length == f.nBins, s"stds missing: ${f.stds}")
    assert(f.stds.forall(s => s > 0 && !s.isNaN), f.stds.toString)
    val same = Stability.evaluateContinuous(cm, df, "yc")
    val fs = same.features.head
    assert(fs.driftP.length == f.nBins)
    // identical sample: no significant drift anywhere, deltas ~0
    assert(fs.driftP.forall(p => p.isNaN || p > 0.99), fs.driftP.toString)
    assert(!fs.unstable, fs.reasons.toString)
    // shift y by +30 inside each bin: frequencies unchanged (PSI quiet) but
    // every bin's mean drifts -> Welch fires
    val shifted = df.withColumn("yc", col("yc") + 30.0)
    val dr = Stability.evaluateContinuous(cm, shifted, "yc").features.head
    assert(dr.psiValue < 0.01, dr.psiValue.toString)
    assert(dr.driftP.forall(p => !p.isNaN && p < 0.01), dr.driftP.toString)
    assert(dr.rateDelta.forall(d => math.abs(d - 30.0) < 1.0), dr.rateDelta.toString)
  }

  test("continuous stds survive the model JSON round-trip") {
    val cm = ContinuousCarver.fit(df, "yc", spec,
      config = BinaryCarver.Config(sortBy = "kruskal"))
    val back = graft.carve.Json.readModel(cm.toJson)
    assert(back.kept.head.stds == cm.kept.head.stds)
  }
}
