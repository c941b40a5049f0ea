package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-declared ordinal FEATURES (reference OrdinalFeature,
  * `ordinal_feature.py:17-36` + `ordinal_discretizer.py:94-187`): declared
  * total value order, rare values merged only with declared neighbours,
  * consecutive-only DP groups — pinned end-to-end against a fixture
  * produced by EXECUTING the reference (`tools/gen_ref_saved.py`: fit +
  * save + transform with ordinals={"ord_a": [low, mid, high, vhigh]}).
  */
class OrdinalFeatureSpec extends SparkSuite {
  import spark.implicits._

  private val declared = Seq("low", "mid", "high", "vhigh")

  private lazy val df: DataFrame =
    spark.read.option("header", "true")
      .csv(getClass.getResource("/golden/ref_saved_ordinal.csv").getPath)
      .select(col("row").cast("long"), col("num_a").cast("double"), col("ord_a"),
        col("y_binary").cast("int"),
        col("t_num_a").cast("int"), col("t_ord_a").cast("int"))
      .cache()

  private lazy val model = BinaryCarver.fit(df, "y_binary", Seq(
    BinaryCarver.FeatureSpec("num_a", "quantitative"),
    BinaryCarver.FeatureSpec("ord_a", "ordinal", declared)),
    config = BinaryCarver.Config(minFreq = 0.05, maxNMod = 5))

  test("ordinal fit parity: our transform matches the reference's (golden-style)") {
    val out = model.transform(df)
    val bad = out.filter(col("ord_a") =!= col("t_ord_a") || col("num_a") =!= col("t_num_a"))
      .limit(5).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("rare declared value merges with its declared neighbour, not by rate") {
    // reference carve: vhigh (3%) -> high; bins keep declared contiguity
    val f = model.kept.find(_.name == "ord_a").get
    assert(f.kind == "ordinal")
    assert(f.valueToBin("vhigh") == f.valueToBin("high"), f.valueToBin.toString)
    // every bin's members are contiguous in the declared order
    val binOf = declared.map(v => f.valueToBin(v))
    binOf.sliding(2).foreach { case Seq(a, b) =>
      assert(b == a || b == a + 1, s"non-contiguous declared bins: $binOf")
    }
    // bin label lists the pre-merged members, so transform survives a
    // reference-schema round-trip
    assert(f.binLabels.exists(l => l.contains("vhigh") && l.contains("high")))
  }

  test("moveValue whole-bin shortcut still enforces ordinal contiguity") {
    // fixture bins: {low}, {mid}, {high, vhigh} — "low" is alone in its
    // bin, so moveValue takes the whole-bin groupBins shortcut. Merging it
    // across "mid" must throw (reference move() checks target contiguity
    // on EVERY move); the adjacent merge must succeed.
    val f = model.kept.find(_.name == "ord_a").get
    assume(f.valueToBin.count(_._2 == f.valueToBin("low")) == 1)
    val gapBin = f.valueToBin("high")
    assume(gapBin > f.valueToBin("low") + 1)
    intercept[IllegalArgumentException] {
      model.moveValue("ord_a", "low", gapBin)
    }
    val ok = model.moveValue("ord_a", "low", f.valueToBin("mid"))
    val of = ok.kept.find(_.name == "ord_a").get
    assert(of.valueToBin("low") == of.valueToBin("mid"))
  }

  test("reference-saved ordinal JSON loads and transforms identically") {
    val m = RefJson.load(getClass.getResource("/golden/ref_saved_OrdinalFeature.json").getPath)
    val of = m.kept.find(_.name == "ord_a").get
    assert(of.kind == "ordinal")
    val out = m.transform(df)
    val bad = out.filter(col("ord_a") =!= col("t_ord_a") || col("num_a") =!= col("t_num_a"))
      .limit(5).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("reference-schema round-trip of an ordinal model preserves the transform") {
    val back = RefJson.read(RefJson.write(model))
    val a = model.transform(df).select("row", "ord_a", "num_a").collect().sortBy(_.getLong(0))
    val b = back.transform(df).select("row", "ord_a", "num_a").collect().sortBy(_.getLong(0))
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
  }

  test("observed-but-undeclared value raises; NaN cannot be declared") {
    val bad = Seq(("whoops", 1), ("low", 0)).toDF("ord_a", "y")
    val ex = intercept[Exception] {
      BinaryCarver.fit(bad, "y", Seq(BinaryCarver.FeatureSpec("ord_a", "ordinal", declared)))
    }
    assert(ex.getMessage.contains("not in the declared order"), ex.getMessage)
    intercept[IllegalArgumentException] {
      BinaryCarver.fit(bad.filter(col("ord_a") === "low"), "y",
        Seq(BinaryCarver.FeatureSpec("ord_a", "ordinal", Seq("low", BinaryCarver.NanLabel))))
    }
  }

  test("declared ordinal works across carver families (ordinal + multiclass y)") {
    val rows = (0 until 3000).map { i =>
      val v = declared((i % 10) match { case 0 => 3; case x if x < 5 => 0; case x if x < 8 => 1; case _ => 2 })
      val yo = 1 + (declared.indexOf(v) min 2)
      (v, yo, s"c${yo}")
    }
    val kdf = rows.toDF("ord_a", "y_ord", "y_cls")
    val om = OrdinalCarver.fit(kdf, "y_ord", Seq(BinaryCarver.FeatureSpec("ord_a", "ordinal", declared)))
    assert(om.kept.nonEmpty)
    val obins = declared.map(om.kept.head.feature.valueToBin.get)
    assert(obins.forall(_.isDefined), obins.toString)
    val mm = MulticlassCarver.fit(kdf, "y_cls", Seq(BinaryCarver.FeatureSpec("ord_a", "ordinal", declared)))
    assert(mm.kept.nonEmpty)
  }
}
