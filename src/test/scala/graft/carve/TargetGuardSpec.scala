package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The reference's carver-level input guards
  * (`tests/carvers/test_target_guard.py`, `tests/carvers/test_defaults.py`):
  *
  *  - a target column that leaked into the feature declarations (e.g. a
  *    from_dataframe-style "declare every column" flow) is WARNED about and
  *    DROPPED, not an error (`base_carver.py:440-453` — in this engine's
  *    API the target is declared by column name, so a spec named like the
  *    target IS the target column);
  *  - `max_n_mod < 2` is rejected at construction (`base_carver.py:300`) —
  *    it would carve every feature into one constant modality.
  */
class TargetGuardSpec extends SparkSuite {
  import spark.implicits._

  private def frame = (0 until 200).map { i =>
    (Vector("a", "b", "c")(i % 3), i.toDouble, if (i % 3 != 0 && i % 2 == 0) 1 else 0)
  }.toDF("f1", "f2", "target")

  private val leaked = Seq(
    BinaryCarver.FeatureSpec("f1", "categorical"),
    BinaryCarver.FeatureSpec("f2", "quantitative"),
    BinaryCarver.FeatureSpec("target", "quantitative"))

  test("binary carver drops a target column declared as a feature") {
    val m = BinaryCarver.fit(frame, "target", leaked, config = BinaryCarver.Config(minFreq = 0.1))
    assert(!m.features.exists(_.name == "target"), m.features.map(_.name))
    assert(m.features.map(_.name).toSet == Set("f1", "f2"))
  }

  test("continuous carver drops a target column declared as a feature") {
    val df = frame.withColumn("target", col("f2") * 2 + col("target"))
    val m = ContinuousCarver.fit(df, "target", leaked)
    assert(!m.features.exists(_.name == "target"))
  }

  test("ordinal carver drops a target column declared as a feature") {
    val df = frame.withColumn("target", (col("f2") > 100).cast("int") + (col("f2") > 150).cast("int"))
    val m = OrdinalCarver.fit(df, "target", leaked)
    assert(!m.features.exists(_.feature.name == "target"))
  }

  test("multiclass carver drops a target column declared as a feature") {
    val df = frame.withColumn("target", pmod(col("f2").cast("int"), lit(3)).cast("string"))
    val specs = leaked.init :+ BinaryCarver.FeatureSpec("target", "categorical")
    val m = MulticlassCarver.fit(df, "target", specs)
    assert(!m.features.exists(_.feature.name == "target"))
  }

  test("one-vs-rest carver drops a target column declared as a feature") {
    val df = frame.withColumn("target", pmod(col("f2").cast("int"), lit(3)).cast("string"))
    val specs = leaked.init :+ BinaryCarver.FeatureSpec("target", "categorical")
    val m = OneVsRestCarver.fit(df, "target", specs)
    m.classes.foreach { c =>
      assert(!m.perClass(c).features.exists(_.name == "target"))
    }
  }

  test("binary carver rejects a non-binary or null-bearing target (no silent garbage rates)") {
    val spec = Seq(BinaryCarver.FeatureSpec("c", "categorical"))
    val multi = (0 until 60).map(i => (i % 3, Vector("a", "b")(i % 2))).toDF("y", "c")
    val e = intercept[IllegalArgumentException](BinaryCarver.fit(multi, "y", spec))
    assert(e.getMessage.contains("must be binary"), e.getMessage)
    val withNull = (0 until 60)
      .map(i => (if (i == 7) null else Integer.valueOf(i % 2), Vector("a", "b")(i % 2)))
      .toDF("y", "c")
    val e2 = intercept[IllegalArgumentException](BinaryCarver.fit(withNull, "y", spec))
    assert(e2.getMessage.contains("NaN/null"), e2.getMessage)
  }

  test("ordinal carver rejects <=2-level, non-integer and null-bearing targets") {
    val spec = Seq(BinaryCarver.FeatureSpec("c", "categorical"))
    val twoLevel = (0 until 60).map(i => (i % 2 + 1, Vector("a", "b", "c")(i % 3))).toDF("y", "c")
    val e = intercept[IllegalArgumentException](OrdinalCarver.fit(twoLevel, "y", spec))
    assert(e.getMessage.contains("2 levels"), e.getMessage)
    val nonInt = (0 until 60).map(i => ((i % 3) + 0.5, Vector("a", "b", "c")(i % 3))).toDF("y", "c")
    val e2 = intercept[IllegalArgumentException](OrdinalCarver.fit(nonInt, "y", spec))
    assert(e2.getMessage.contains("integer-encoded"), e2.getMessage)
    val strY = (0 until 60).map(i => (Vector("lo", "mid", "hi")(i % 3), Vector("a", "b", "c")(i % 3))).toDF("y", "c")
    val e3 = intercept[IllegalArgumentException](OrdinalCarver.fit(strY, "y", spec))
    assert(e3.getMessage.contains("integer-encode"), e3.getMessage)
  }

  test("continuous carver rejects non-numeric and null-bearing targets") {
    val spec = Seq(BinaryCarver.FeatureSpec("c", "categorical"))
    val strY = (0 until 60).map(i => (s"v$i", Vector("a", "b")(i % 2))).toDF("y", "c")
    val e = intercept[IllegalArgumentException](ContinuousCarver.fit(strY, "y", spec))
    assert(e.getMessage.contains("must be numeric"), e.getMessage)
    val nullY = (0 until 60)
      .map(i => (if (i == 3) null else java.lang.Double.valueOf(i.toDouble), Vector("a", "b")(i % 2)))
      .toDF("y", "c")
    val e2 = intercept[IllegalArgumentException](ContinuousCarver.fit(nullY, "y", spec))
    assert(e2.getMessage.contains("NaN/null"), e2.getMessage)
  }

  test("multiclass / one-vs-rest reject null y and train/dev class-set mismatches") {
    val spec = Seq(BinaryCarver.FeatureSpec("c", "categorical"))
    def frame(classes: Seq[String]) = (0 until 90)
      .map(i => (classes(i % classes.length), Vector("a", "b", "c")(i % 3))).toDF("y", "c")
    val nullY = (0 until 90)
      .map(i => (if (i == 5) null else Vector("x", "y", "z")(i % 3), Vector("a", "b", "c")(i % 3)))
      .toDF("y", "c")
    val e = intercept[IllegalArgumentException](MulticlassCarver.fit(nullY, "y", spec))
    assert(e.getMessage.contains("should not contain null"), e.getMessage)
    // dev missing a train class raises in BOTH family fits (either direction)
    val train = frame(Seq("x", "y", "z"))
    val devMissing = frame(Seq("x", "y"))
    val e2 = intercept[IllegalArgumentException](
      MulticlassCarver.fit(train, "y", spec, dev = Some(devMissing)))
    assert(e2.getMessage.contains("Mismatched classes"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      OneVsRestCarver.fit(train, "y", spec, dev = Some(devMissing)))
    assert(e3.getMessage.contains("Mismatched classes"), e3.getMessage)
  }

  test("max_n_mod < 2 is rejected at construction in every family config") {
    intercept[IllegalArgumentException](BinaryCarver.Config(maxNMod = 1))
    intercept[IllegalArgumentException](OrdinalCarver.Config(maxNMod = 1))
    intercept[IllegalArgumentException](MulticlassCarver.Config(maxNMod = 0))
  }

  test("cv=1 is rejected at construction (not enough splits; 0 disables CV)") {
    intercept[IllegalArgumentException](BinaryCarver.Config(cv = 1))
    intercept[IllegalArgumentException](OrdinalCarver.Config(cv = 1))
    intercept[IllegalArgumentException](MulticlassCarver.Config(cv = 1))
    BinaryCarver.Config(cv = 0)
    BinaryCarver.Config(cv = 3)
  }
}
