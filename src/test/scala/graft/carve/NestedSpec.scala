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
}
