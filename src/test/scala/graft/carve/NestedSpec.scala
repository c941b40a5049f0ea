package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Nested rollup (P6) + unseen remap (X4). */
class NestedSpec extends SparkSuite {
  import spark.implicits._

  /** city ⊂ region ⊂ country with rare cities/regions. */
  private lazy val df = {
    val rows = (0 until 4000).map { i =>
      // two big cities, a mid city, and a tail of rare cities in rare regions
      val (city, region, country) =
        if (i % 100 < 45) ("paris", "idf", "fr")
        else if (i % 100 < 85) ("lyon", "aura", "fr")
        else if (i % 100 < 93) ("berlin", "be", "de")
        else if (i % 100 < 96) ("nice", "paca", "fr")       // rare city, rare-ish region
        else if (i % 100 < 98) ("cannes", "paca", "fr")     // rare city, same region
        else ("tinytown", "tinyreg", "xx")                  // rare at every level
      val y = if (country == "fr" && i % 3 == 0) 1 else 0
      (i.toLong, city, region, country, y)
    }
    rows.toDF("id", "city", "region", "country", "y")
  }

  test("rare cities roll up to region; terminally-rare pools to __OTHER__") {
    val m = Nested.fit(df, Seq("city", "region", "country"), minFreq = 0.05, target = Some("y"))
    // big cities survive as themselves
    assert(m.rawToBucket("paris") == "paris")
    assert(m.rawToBucket("lyon") == "lyon")
    assert(m.rawToBucket("berlin") == "berlin")
    // nice+cannes (3%+2%) roll up to their shared region (5% -> frequent)
    assert(m.rawToBucket("nice") == "paca")
    assert(m.rawToBucket("cannes") == "paca")
    // tinytown (2%) stays rare at region AND country level -> __OTHER__
    assert(m.rawToBucket("tinytown") == BinaryCarver.OtherLabel)
    // every surviving bucket except the terminal __OTHER__ pool is frequent
    // (the pool legitimately stays rare: nothing coarser to roll into)
    val out = m.transform(df)
    val counts = out.groupBy("city").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (b, c) =>
      if (b != BinaryCarver.OtherLabel)
        assert(!Stats.isSignificantlyBelow(c.toDouble, 4000L, 0.05, 0.05), s"$b still rare: $c")
    }
  }

  test("unseen finest value at transform maps to __OTHER__ (X4); null passes through") {
    val m = Nested.fit(df, Seq("city", "region", "country"), minFreq = 0.05, target = Some("y"))
    val newData = Seq(("marseille": String), (null: String)).toDF("city")
    val got = m.transform(newData).collect().map(r => Option(r.getString(0)))
    assert(got(0).contains(BinaryCarver.OtherLabel))
    assert(got(1).isEmpty)
  }

  test("unseen finest with a known parent lands in the parent's bucket (X4 walk)") {
    val m = Nested.fit(df, Seq("city", "region", "country"), minFreq = 0.05, target = Some("y"))
    // "antibes" was never seen, but its row says region=paca — and paca IS a
    // surviving bucket (nice+cannes rolled into it), so the row-wise parent
    // walk must resolve to paca, not __OTHER__ (base_discretizer.py:676-712)
    val newData = Seq(
      ("antibes", "paca", "fr"),   // unseen city, bucket parent -> paca
      ("unknown", "nowhere", "zz"), // unseen city, unknown parents -> __OTHER__
      ("paris", "idf", "fr")        // seen value unaffected by the walk
    ).toDF("city", "region", "country")
    val got = m.transform(newData).select("city").collect().map(_.getString(0))
    assert(got(0) == "paca", got.mkString(","))
    assert(got(1) == BinaryCarver.OtherLabel)
    assert(got(2) == "paris")
  }

  test("dirty hierarchy (child under two parents) raises") {
    val bad = Seq(("a", "p1"), ("a", "p2")).toDF("city", "region")
    intercept[IllegalArgumentException] {
      Nested.fit(bad, Seq("city", "region"), minFreq = 0.6)
    }
  }

  test("rolled-up column carves as an ordinary categorical") {
    val m = Nested.fit(df, Seq("city", "region", "country"), minFreq = 0.05, target = Some("y"))
    val rolled = m.transform(df)
    val carved = BinaryCarver.fit(rolled, "y", Seq(BinaryCarver.FeatureSpec("city", "categorical")))
    assert(carved.kept.nonEmpty)
  }

  // ---------------- nested as a carver FeatureSpec kind (P6 integration)

  private lazy val nestedSpec =
    BinaryCarver.FeatureSpec("city", "nested", parents = Seq("region", "country"))
  private lazy val nestedModel =
    BinaryCarver.fit(df, "y", Seq(nestedSpec), config = BinaryCarver.Config(minFreq = 0.1))

  test("nested FeatureSpec kind: fit runs end-to-end inside BinaryCarver") {
    val f = nestedModel.kept.find(_.name == "city").get
    assert(f.kind == "nested")
    assert(f.parents == Vector("region", "country"))
    // the rollup ran inside fit at half min_freq (0.05): nice/cannes live in
    // the paca bucket, tinytown pooled into __OTHER__
    assert(f.valueToBin.contains("paris") && f.valueToBin.contains("nice"))
    assert(f.valueToBin("nice") == f.valueToBin("cannes"))
    assert(f.leaderToBin.contains("paca"), f.leaderToBin.toString)
    assert(f.valueToBin("nice") == f.leaderToBin("paca"))
    assert(f.hasDefault)
  }

  test("nested kind matches pre-rolled categorical carve (same bins, same transform)") {
    // composing the standalone rollup (at the carver's half min_freq) with a
    // categorical carve must give the identical model — the integrated kind
    // is the same math riding one histogram pass
    val pre = Nested.fit(df, Seq("city", "region", "country"), minFreq = 0.05, target = Some("y"))
    val carved = BinaryCarver.fit(pre.transform(df), "y",
      Seq(BinaryCarver.FeatureSpec("city", "categorical")),
      config = BinaryCarver.Config(minFreq = 0.1))
    val a = nestedModel.transform(df).select(col("id"), col("city")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = carved.transform(pre.transform(df)).select(col("id"), col("city")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("nested kind transform: X4 walk on unseen finest, null -> NaN handling") {
    val f = nestedModel.kept.find(_.name == "city").get
    val newData = Seq(
      (1L, "antibes", "paca", "fr"),    // unseen city, parent is a bucket leader
      (2L, "unknown", "nowhere", "zz"), // unseen everything -> default bucket
      (3L, "paris", "idf", "fr"),
      (4L, null.asInstanceOf[String], "idf", "fr")
    ).toDF("id", "city", "region", "country")
    val got = nestedModel.transform(newData).select("id", "city").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -99 else r.getInt(1))).toMap
    assert(got(1L) == f.leaderToBin("paca"))
    assert(got(2L) == (if (f.otherBin >= 0) f.otherBin else -99))
    assert(got(3L) == f.valueToBin("paris"))
    assert(got(4L) == (if (f.nanBin >= 0) f.nanBin else -99))
  }

  test("nested kind survives the engine JSON round-trip") {
    val json = nestedModel.toJson
    val back = Json.readModel(json)
    val f = back.kept.find(_.name == "city").get
    assert(f.kind == "nested" && f.parents == Vector("region", "country"))
    assert(f.leaderToBin == nestedModel.kept.head.leaderToBin)
    val a = nestedModel.transform(df).select("id", "city").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = back.transform(df).select("id", "city").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("nested kind works in the continuous carver (same rollup, mean-y sort)") {
    // continuous target whose mean varies by city bucket + in-bucket noise
    val dfc = df.withColumn("yc",
      col("y").cast("double") * 10.0 + (col("id") % 7).cast("double"))
    val m = ContinuousCarver.fit(dfc, "yc", Seq(nestedSpec),
      config = BinaryCarver.Config(minFreq = 0.1, sortBy = "kruskal"))
    val f = m.kept.find(_.name == "city").get
    assert(f.kind == "nested" && f.parents == Vector("region", "country"))
    assert(f.valueToBin("nice") == f.valueToBin("cannes"))
    // equivalence with the pre-rolled categorical continuous carve
    val pre = Nested.fit(dfc, Seq("city", "region", "country"), minFreq = 0.05, target = Some("yc"))
    val carved = ContinuousCarver.fit(pre.transform(dfc), "yc",
      Seq(BinaryCarver.FeatureSpec("city", "categorical")),
      config = BinaryCarver.Config(minFreq = 0.1, sortBy = "kruskal"))
    val a = m.transform(dfc).select(col("id"), col("city")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = carved.transform(pre.transform(dfc)).select(col("id"), col("city")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("nested kind in the ordinal carver matches the reference (pinned by executing it)") {
    // reference OrdinalCarver(nested={"city": ["region"]}, min_freq=0.1,
    // max_n_mod=4) on this exact deterministic fixture fits bins
    // {paris} / {lyon, berlin, paca(nice+cannes), __OTHER__(tinytown)} with
    // mean train-ridits 0.385284 / 0.593859 and counts 1800 / 2200
    val rows = (0 until 4000).map { i =>
      val m = i % 100
      val (city, region) =
        if (m < 45) ("paris", "idf")
        else if (m < 85) ("lyon", "aura")
        else if (m < 93) ("berlin", "be")
        else if (m < 96) ("nice", "paca")
        else if (m < 98) ("cannes", "paca")
        else ("tinytown", "tinyreg")
      val h = (i * 2654435761L) % 97
      val base = Map("paris" -> 10, "lyon" -> 40, "berlin" -> 60, "nice" -> 75,
        "cannes" -> 80, "tinytown" -> 90)(city)
      val y = 1 + (if (h < base) 1 else 0) + (if (h < base - 30) 1 else 0)
      (i.toLong, city, region, y)
    }.toDF("id", "city", "region", "y")
    val m = OrdinalCarver.fit(rows, "y",
      Seq(BinaryCarver.FeatureSpec("city", "nested", parents = Seq("region"))),
      config = OrdinalCarver.Config(minFreq = 0.1, maxNMod = 4))
    val f = m.kept.find(_.feature.name == "city").get.feature
    assert(f.kind == "nested" && f.nBins == 2)
    assert(f.valueToBin("paris") == 0)
    Seq("lyon", "berlin", "nice", "cannes", "tinytown").foreach(v =>
      assert(f.valueToBin(v) == 1, s"$v -> ${f.valueToBin(v)}"))
    assert(math.abs(f.rates(0).rate - 0.385284) < 1e-6, f.rates(0).rate.toString)
    assert(math.abs(f.rates(1).rate - 0.593859) < 1e-6, f.rates(1).rate.toString)
    assert(f.rates.map(_.count.toLong) == Vector(1800L, 2200L))
    // transform: same 1800/2200 split; X4 walk live for unseen cities
    val counts = m.transform(rows).groupBy("city").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> 1800L, 1 -> 2200L))
    val unseen = Seq((1L, "antibes", "paca"), (2L, "nowhereville", "zz"))
      .toDF("id", "city", "region")
    val got = m.transform(unseen).select("id", "city").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == f.leaderToBin.getOrElse("paca", f.valueToBin("nice")))
    assert(got(2L) == f.otherBin || got(2L) == 1)
  }

  test("nested default bucket with NO terminal pooling: unresolved unseen lands in the last bin (reference-pinned)") {
    // reference BinaryCarver(nested={"city": ["region"]}, min_freq=0.1,
    // max_n_mod=4) on this fixture (no rare bucket -> no __OTHER__ mass):
    // label_per_value = {lyon:0, paris:0, __OTHER__:1, berlin:1} — the
    // has_default setter appends a zero-mass __OTHER__ as the LAST
    // modality, so an unresolved unseen value transforms to bin 1
    val rows = (0 until 3000).map { i =>
      val m = i % 10
      val (city, region) =
        if (m < 4) ("paris", "idf") else if (m < 7) ("lyon", "aura") else ("berlin", "be")
      val y = if ((i * 7) % 10 < Map("paris" -> 1, "lyon" -> 3, "berlin" -> 8)(city)) 1 else 0
      (i.toLong, city, region, y)
    }.toDF("id", "city", "region", "y")
    val m = BinaryCarver.fit(rows, "y",
      Seq(BinaryCarver.FeatureSpec("city", "nested", parents = Seq("region"))),
      config = BinaryCarver.Config(minFreq = 0.1, maxNMod = 4))
    val f = m.kept.head
    assert(f.nBins == 2)
    assert(f.valueToBin("lyon") == 0 && f.valueToBin("paris") == 0 && f.valueToBin("berlin") == 1,
      f.valueToBin.toString)
    assert(f.otherBin == 1, s"otherBin=${f.otherBin}") // zero-mass default joins the last bin
    assert(f.binLabels(1).contains(BinaryCarver.OtherLabel), f.binLabels.toString)
    val out = m.transform(Seq((1L, "marseille", "nowhere")).toDF("id", "city", "region"))
      .select("city").head().getInt(0)
    assert(out == 1)
  }

  test("nested kind in the one-vs-rest carver matches the reference (pinned by executing it)") {
    // reference OneVsRestCarver(nested={"city": ["region"]}, min_freq=0.1,
    // max_n_mod=4) on this fixture: classes sorted [a,b,c], first dropped;
    // city__y=b bins {paris}=0.101667/1800, {rest}=0.31/2200;
    // city__y=c bins {rest}=0.500455/2200, {paris}=0.898333/1800
    // (per-class rollup + sort on each class's OWN binarized rate)
    val rows = (0 until 4000).map { i =>
      val m = i % 100
      val (city, region) =
        if (m < 45) ("paris", "idf")
        else if (m < 85) ("lyon", "aura")
        else if (m < 93) ("berlin", "be")
        else if (m < 96) ("nice", "paca")
        else if (m < 98) ("cannes", "paca")
        else ("tinytown", "tinyreg")
      val h = (i * 2654435761L) % 97
      val base = Map("paris" -> 10, "lyon" -> 40, "berlin" -> 60, "nice" -> 75,
        "cannes" -> 80, "tinytown" -> 90)(city)
      val y = if (h < base - 30) "a" else if (h < base) "b" else "c"
      (i.toLong, city, region, y)
    }.toDF("id", "city", "region", "y")
    val m = OneVsRestCarver.fit(rows, "y",
      Seq(BinaryCarver.FeatureSpec("city", "nested", parents = Seq("region"))),
      config = BinaryCarver.Config(minFreq = 0.1, maxNMod = 4))
    assert(m.classes == Vector("b", "c"))
    val fb = m.perClass("b").kept.head
    assert(fb.kind == "nested" && fb.nBins == 2)
    assert(fb.valueToBin("paris") == 0 && fb.valueToBin("lyon") == 1)
    assert(math.abs(fb.rates(0).rate - 0.101667) < 1e-6 && fb.rates(0).count == 1800.0)
    assert(math.abs(fb.rates(1).rate - 0.31) < 1e-6 && fb.rates(1).count == 2200.0)
    val fc = m.perClass("c").kept.head
    assert(fc.valueToBin("paris") == 1 && fc.valueToBin("lyon") == 0)
    assert(math.abs(fc.rates(0).rate - 0.500455) < 1e-6)
    assert(math.abs(fc.rates(1).rate - 0.898333) < 1e-6)
    // transform emits one bin column per carved class
    val out = m.transform(rows)
    assert(out.columns.contains("city__y=b_bin") && out.columns.contains("city__y=c_bin"))
  }

  test("nested kind validation: missing parents or self-parent raises") {
    intercept[IllegalArgumentException] {
      BinaryCarver.fit(df, "y", Seq(BinaryCarver.FeatureSpec("city", "nested")))
    }
    intercept[IllegalArgumentException] {
      BinaryCarver.fit(df, "y",
        Seq(BinaryCarver.FeatureSpec("city", "nested", parents = Seq("city"))))
    }
    intercept[IllegalArgumentException] {
      BinaryCarver.fit(df, "y",
        Seq(BinaryCarver.FeatureSpec("city", "nested", parents = Seq("not_a_col"))))
    }
  }

  test("nested under a multiclass target: engine's typed error pinned to the reference crash") {
    // the engine REFUSES nested×multiclass with a rationale (the reference's
    // NestedDiscretizer target sort crashes on string classes). That claim
    // is pinned by EXECUTING the reference (tools/gen_ref_pins.py →
    // ref_pins.json): if a future reference release fixes the crash, the
    // regenerated pin flips `raises` and this test fails, forcing the
    // engine to implement the path instead of silently diverging.
    val in = getClass.getResourceAsStream("/graft/ref_pins.json")
    assert(in != null, "ref_pins.json missing — run tools/gen_ref_pins.py")
    val pins = try org.json4s.jackson.JsonMethods.parse(
      scala.io.Source.fromInputStream(in, "UTF-8").mkString) finally in.close()
    import org.json4s._
    assert((pins \ "nested_multiclass" \ "raises") == JBool(true),
      "the reference no longer crashes on nested×multiclass — implement the " +
        s"path and drop the engine's typed error: ${pins \ "nested_multiclass"}")
    // and the engine's own refusal still stands, with the documented message
    val mdf = df.withColumn("k", concat(lit("c"), pmod(col("id"), lit(3)).cast("string")))
    val e = intercept[IllegalArgumentException] {
      MulticlassCarver.fit(mdf, "k",
        Seq(BinaryCarver.FeatureSpec("city", "nested", parents = Seq("region"))))
    }
    assert(e.getMessage.contains("nested features are not supported"), e.getMessage)
  }
}
