package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BinaryCarverSpec extends SparkSuite {
  import spark.implicits._

  /** deterministic synthetic frame: numeric with strong signal, categorical
    * with medium signal + a rare tail, target binary.
    */
  private lazy val df = {
    val rows = (0 until 4000).map { i =>
      val x = (i % 100).toDouble                       // numeric 0..99
      val cat = if (i % 200 >= 197) s"rare${i % 3}" else s"c${i % 5}" // rare* ≈ 0.5% each
      val noise = (i * 2654435761L % 97) / 97.0        // deterministic "noise"
      val y = if (x / 100.0 * 0.8 + (if (cat == "c1") 0.2 else 0.0) + noise * 0.4 > 0.7) 1 else 0
      (i.toLong, x, cat, y)
    }
    rows.toDF("id", "x", "cat", "y")
  }

  private lazy val model = BinaryCarver.fit(
    df, "y",
    Seq(BinaryCarver.FeatureSpec("x", "quantitative"), BinaryCarver.FeatureSpec("cat", "categorical"))
  )

  test("fit keeps both features and respects max_n_mod") {
    assert(model.kept.map(_.name).toSet == Set("x", "cat"))
    model.kept.foreach { f =>
      assert(f.nBins >= 2 && f.nBins <= 5, s"${f.name}: ${f.nBins} bins")
    }
  }

  test("bins respect min_freq and have monotone-distinct rates per feature") {
    model.kept.foreach { f =>
      val total = f.rates.map(_.count).sum
      f.rates.foreach { r =>
        assert(!Stats.isSignificantlyBelow(r.count, math.round(total), model.minFreq, 0.05),
          s"${f.name}/${r.label}: freq ${r.frequency} below min_freq")
      }
      f.rates.sliding(2).foreach {
        case Seq(a, b) => assert(!Stats.isClose(b.rate, a.rate), s"${f.name}: non-distinct rates")
        case _ =>
      }
    }
  }

  test("numeric carving recovers the monotone signal") {
    val f = model.kept.find(_.name == "x").get
    // target rises with x → bin rates should be (weakly) increasing in bin order
    val rates = f.rates.map(_.rate)
    assert(rates == rates.sorted, s"rates not monotone: $rates")
  }

  test("transform assigns every row a bin and matches driver-side searchsorted") {
    val out = model.transform(df, keepOriginal = true)
    assert(out.filter(col("x_bin").isNull || col("cat_bin").isNull).count() == 0)
    val f = model.kept.find(_.name == "x").get
    val check = out.select("x", "x_bin").distinct().as[(Double, Int)].collect()
    check.foreach { case (x, bin) =>
      val prebin = BinaryCarver.searchsortedLeft(f.prebinEdges, x)
      assert(f.prebinToBin(prebin) == bin, s"x=$x")
    }
  }

  test("rare categoricals land in __OTHER__ and unseen values map to it") {
    val f = model.kept.find(_.name == "cat").get
    assert(f.hasDefault && f.otherBin >= 0)
    val out = model.transform(Seq((1L, 5.0, "never_seen_value", 0)).toDF("id", "x", "cat", "y"))
    assert(out.select("cat").as[Int].head() == f.otherBin)
  }

  test("JSON round-trip preserves the transform exactly") {
    val path = java.nio.file.Files.createTempFile("carver", ".json").toString
    model.save(path)
    val loaded = BinaryCarver.load(path)
    assert(loaded.features.map(_.name) == model.features.map(_.name))
    val a = model.transform(df).select("id", "x", "cat").orderBy("id").collect()
    val b = loaded.transform(df).select("id", "x", "cat").orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("NaN values get their own or a merged bin (dropna fan-out)") {
    val withNan = df.withColumn("x", when(col("id") % 10 === 0, lit(null)).otherwise(col("x")))
    val m = BinaryCarver.fit(withNan, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    val f = m.kept.find(_.name == "x")
    assert(f.nonEmpty, "feature with NaN dropped")
    assert(f.get.hasNan && f.get.nanBin >= 0)
    val out = m.transform(withNan)
    assert(out.filter(col("x").isNull).count() == 0, "NaN rows must be binned")
  }

  test("dev veto: structure-breaking dev sample fails rank-order and prunes") {
    // dev with inverted target → rank-order test must reject non-trivial splits
    val dev = df.withColumn("y", lit(1) - col("y"))
    val m = BinaryCarver.fit(df, "y",
      Seq(BinaryCarver.FeatureSpec("x", "quantitative")), dev = Some(dev))
    // with a fully-inverted dev, no combination can have identical rank order
    assert(m.features.head.dropped, "inverted dev should veto every combination")
  }

  test("leakage guard composes with fit (fit on past slice only)") {
    val withTs = df.withColumn("ts",
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, id, 0)"))
    val cutoff = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val guarded = graft.temporal.Temporal.leakageGuard(withTs, "ts", cutoff)
    assert(guarded.count() == withTs.filter(col("ts") <= lit(cutoff)).count())
    val m = BinaryCarver.fit(guarded, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    // the model must equal one fit directly on the manually-sliced frame
    val m2 = BinaryCarver.fit(withTs.filter(col("ts") <= lit(cutoff)), "y",
      Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    assert(m.toJson == m2.toJson, "zero-leakage: guarded fit == sliced fit")
  }

  test("S1 input audit: missing/duplicate/mistyped declarations raise") {
    val d = Seq((1.0, "a", 0), (2.0, "b", 1)).toDF("x", "c", "y")
    val q = BinaryCarver.FeatureSpec("x", "quantitative")
    intercept[IllegalArgumentException](
      BinaryCarver.validateInputs(d, "y", Seq(BinaryCarver.FeatureSpec("nope", "quantitative"))))
    intercept[IllegalArgumentException](BinaryCarver.validateInputs(d, "y", Seq(q, q)))
    // a target-named spec is not an error: fit warns and drops it, matching
    // the reference guard (base_carver.py:440-453) — see TargetGuardSpec
    assert(BinaryCarver.guardTarget("y",
      Seq(q, BinaryCarver.FeatureSpec("y", "quantitative"))) == Seq(q))
    intercept[IllegalArgumentException](
      BinaryCarver.validateInputs(d, "y", Seq(BinaryCarver.FeatureSpec("c", "quantitative"))))
    intercept[IllegalArgumentException](
      BinaryCarver.validateInputs(d, "y", Seq(BinaryCarver.FeatureSpec("x", "wat"))))
    intercept[IllegalArgumentException](
      BinaryCarver.validateInputs(d, "y", Seq(BinaryCarver.FeatureSpec("c", "ordinal"))))
    intercept[IllegalArgumentException](
      BinaryCarver.validateInputs(d, "nope", Seq(q)))
    BinaryCarver.validateInputs(d, "y", Seq(q, BinaryCarver.FeatureSpec("c", "categorical")))
  }

  test("auditFrame profiles nulls/distincts and reports declared vs detected kinds") {
    val d = Seq(
      (Some(1.0), Option("a"), 0), (Some(2.0), Option("b"), 1),
      (None, Option("a"), 0), (Some(1.0), None, 1)
    ).toDF("x", "c", "y")
    val rows = BinaryCarver.auditFrame(d, "y", Seq(
      BinaryCarver.FeatureSpec("x", "quantitative"),
      BinaryCarver.FeatureSpec("c", "categorical")
    )).collect().map(r => r.getString(0) ->
      (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("x") == (("quantitative", "quantitative", 1L, 2L)))
    assert(rows("c") == (("categorical", "categorical", 1L, 2L)))
    // bad declarations still raise through the S1 path
    intercept[IllegalArgumentException](
      BinaryCarver.auditFrame(d, "y", Seq(BinaryCarver.FeatureSpec("nope", "quantitative"))))
  }

  test("unexpectedValues lists exactly the values transform(checkValues) raises on") {
    val fitDf = (0 until 60).map { i =>
      val c = if (i % 2 == 0) "a" else "b"
      (c, if (c == "a") (if (i % 10 == 0) 0 else 1) else (if (i % 10 == 1) 1 else 0))
    }.toDF("c", "y")
    val m = BinaryCarver.fit(fitDf, "y", Seq(BinaryCarver.FeatureSpec("c", "categorical")),
      config = BinaryCarver.Config(minFreq = 0.1))
    val score = Seq(("a", 1), ("zz", 2), ("zz", 3), (null, 4), ("ww", 5)).toDF("c", "doc_id")
    val got = m.unexpectedValues(score).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("c", "zz", 2L), ("c", "ww", 1L)))
    // and the raise path trips on the same frame
    val ex = intercept[Exception] {
      m.transform(score, checkValues = true).collect()
    }
    assert(ex.getMessage.contains("check_values") || ex.getCause != null)
  }
}
