package graft.stability

import graft.SparkSuite
import graft.carve.BinaryCarver
import org.apache.spark.sql.functions._

class StabilitySpec extends SparkSuite {
  import spark.implicits._

  test("special functions match published values") {
    // chi2 sf: P(X > 3.84, df=1) ≈ 0.05; P(X > 5.991, df=2) ≈ 0.05
    assert(math.abs(SpecialFns.chi2Sf(3.841458820694124, 1) - 0.05) < 1e-9)
    assert(math.abs(SpecialFns.chi2Sf(5.991464547107979, 2) - 0.05) < 1e-9)
    // normal sf: P(Z > 1.959964) ≈ 0.025
    assert(math.abs(SpecialFns.normSf(1.959963984540054) - 0.025) < 1e-9)
    // t two-sided: df=10, t=2.228 → p ≈ 0.05
    assert(math.abs(SpecialFns.tSf2(2.2281388519649385, 10) - 0.05) < 1e-6)
    // erfc(1) = 0.157299207050285
    assert(math.abs(SpecialFns.erfc(1.0) - 0.15729920705028513) < 1e-10)
  }

  test("PSI is 0 for identical distributions, large for shifted ones") {
    val ref = Array(0.25, 0.25, 0.25, 0.25)
    assert(Stability.psi(ref, ref)._1 == 0.0)
    val (shifted, _) = Stability.psi(ref, Array(0.7, 0.1, 0.1, 0.1))
    assert(shifted > 0.25)
    val (nanPsi, _) = Stability.psi(Array(0.5, Double.NaN), Array(0.5, 0.5))
    assert(nanPsi.isNaN)
  }

  test("chi2 homogeneity: same counts → p ≈ 1; disjoint → small p") {
    val (_, pSame, _, vSame) = Stability.chi2Homogeneity(Array(100.0, 100, 100), Array(100.0, 100, 100))
    assert(pSame > 0.99 && vSame < 0.01)
    val (_, pDiff, _, vDiff) = Stability.chi2Homogeneity(Array(200.0, 10, 10), Array(10.0, 200, 10))
    assert(pDiff < 1e-6 && vDiff > 0.3)
  }

  private lazy val df = {
    val rows = (0 until 4000).map { i =>
      val x = (i % 100).toDouble
      val noise = (i * 2654435761L % 97) / 97.0
      val y = if (x / 100.0 * 0.8 + noise * 0.4 > 0.6) 1 else 0
      (i.toLong, x, y)
    }
    rows.toDF("id", "x", "y")
  }
  private lazy val model = BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))

  test("evaluate: the train sample itself is stable") {
    val r = Stability.evaluate(model, df, "y")
    assert(r.features.nonEmpty)
    assert(r.unstableFeatures.isEmpty, r.features.map(f => f.name -> f.reasons).toString)
    val f = r.features.head
    assert(f.psiValue < 0.01)
    assert(f.viableAsDev)
  }

  test("evaluate: a distribution-shifted sample is flagged") {
    // shift x so mass concentrates in the top bins
    val shifted = df.withColumn("x", least(col("x") * 3.0, lit(99.0)))
    val r = Stability.evaluate(model, shifted, "y")
    assert(r.unstableFeatures.contains("x"), r.features.map(f => f.name -> (f.psiValue, f.reasons)).toString)
  }

  test("evaluate: inverted target rates fail the viability-as-dev suite") {
    val inverted = df.withColumn("y", lit(1) - col("y"))
    val r = Stability.evaluate(model, inverted, "y")
    val f = r.features.head
    assert(!f.viableAsDev && f.unstable)
  }
}
