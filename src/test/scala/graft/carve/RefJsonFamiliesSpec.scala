package graft.carve

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S3 interop for the NON-binary families (round-3 missing item #3):
  * reference-saved Ordinal/Multiclass/Continuous carver artifacts — with
  * their family discriminators and `rate_reference` payloads (ridit
  * marginal `ordinal_target_rates.py:66-81`, CA axis
  * `multiclass_target_rates.py:53-62`, per-bin stds) — load into engine
  * models whose transform matches the reference row for row, AND the
  * restored rate state drives the stability monitor. Engine-written
  * artifacts round-trip, and `gen_ref_saved.py --check-load <file> <family>`
  * verifies the reference loads them back.
  */
class RefJsonFamiliesSpec extends SparkSuite {
  import spark.implicits._

  private def resource(name: String): String =
    getClass.getResource(s"/golden/$name").getPath

  /** Family CSV: (row, num_a, cat_a, y, t_num_a, t_cat_a). */
  private def famDf(fam: String, yType: String): DataFrame =
    spark.read.option("header", "true").csv(resource(s"ref_saved_${fam.toLowerCase}.csv"))
      .select(col("row").cast("long"), col("num_a").cast("double"), col("cat_a"),
        col("y").cast(yType), col("t_num_a").cast("int"), col("t_cat_a").cast("int"))
      .cache()

  private def assertTransformMatches(m: BinaryCarver.Model, df: DataFrame): Unit = {
    val out = m.transform(df, keepOriginal = true)
    val conds = m.kept.map(f => col(s"${f.name}_bin") =!= col(s"t_${f.name}"))
    val bad = out.filter(conds.reduce(_ || _)).limit(5).collect()
    assert(bad.isEmpty, s"transform mismatch: ${bad.mkString("; ")}")
  }

  test("reference-saved OrdinalCarver artifact: transform parity + ridit reference restored") {
    val m = RefJson.loadOrdinal(resource("ref_saved_OrdinalCarver.json"))
    assert(m.sortBy == "tau_c")
    val df = famDf("OrdinalCarver", "int")
    assertTransformMatches(m.binaryView, df)
    // the fitted train marginal is restored and usable
    val rr = m.kept.head.rateRef
    assert(rr != null && rr.isInstanceOf[Ordinal.TargetMeanRidit])
    val ridit = rr.asInstanceOf[Ordinal.TargetMeanRidit]
    assert(ridit.refLevels.sameElements(Array(1.0, 2.0, 3.0)), ridit.refLevels.mkString(","))
    assert(ridit.refCounts.sum == 3000.0)
    // and drives the stability monitor: recomputed rates on the SAME sample
    // must reproduce the stored train rates (the monitor's whole premise)
    val rep = graft.stability.Stability.evaluateOrdinal(m, df, "y")
    rep.features.foreach { fs =>
      assert(fs.rateDelta.nonEmpty, fs.name)
      fs.rateDelta.foreach(d => assert(math.abs(d) < 1e-9, s"${fs.name}: delta $d"))
    }
  }

  test("reference-saved MulticlassCarver artifact: transform parity + CA axis restored") {
    val m = RefJson.loadMulticlass(resource("ref_saved_MulticlassCarver.json"))
    assert(m.sortBy == "tschuprowt")
    assert(m.classes.isEmpty) // reference schema carries no class names
    val df = famDf("MulticlassCarver", "string")
    assertTransformMatches(m.binaryView, df)
    val rr = m.kept.head.rateRef
    assert(rr != null && rr.isInstanceOf[Multiclass.CAScoreRate])
    val axis = rr.asInstanceOf[Multiclass.CAScoreRate].axis
    assert(axis.colMass.length == 3 && math.abs(axis.colMass.sum - 1.0) < 1e-9)
    // stability: class order derived from the sample; same-sample rates
    // reproduce the stored train rates
    val rep = graft.stability.Stability.evaluateMulticlass(m, df, "y")
    rep.features.foreach { fs =>
      assert(fs.rateDelta.nonEmpty, fs.name)
      fs.rateDelta.foreach(d => assert(math.abs(d) < 1e-9, s"${fs.name}: delta $d"))
    }
  }

  test("reference-saved ContinuousCarver artifact: transform parity + per-bin stds restored") {
    val m = RefJson.readContinuous(
      java.nio.file.Files.readString(java.nio.file.Paths.get(resource("ref_saved_ContinuousCarver.json"))))
    assert(m.sortBy == "kruskal")
    val df = famDf("ContinuousCarver", "double")
    assertTransformMatches(m, df)
    m.kept.foreach { f =>
      assert(f.stds.length == f.nBins, s"${f.name}: ${f.stds.length} stds for ${f.nBins} bins")
      assert(f.stds.exists(s => !s.isNaN && s > 0.0))
    }
    // the stds feed the Welch drift test: same-sample evaluation runs and
    // reports no drift anywhere
    val rep = graft.stability.Stability.evaluateContinuous(m, df, "y")
    assert(rep.features.nonEmpty)
    rep.features.foreach(fs => assert(!fs.unstable, s"${fs.name} drifted on its own train data"))
  }

  test("reference-saved NestedFeature artifact: transform parity + X4 walk from the artifact alone") {
    val m = RefJson.load(resource("ref_saved_NestedFeature.json"))
    val f = m.kept.find(_.name == "city").get
    assert(f.kind == "nested" && f.parents == Vector("region"), s"${f.kind} ${f.parents}")
    assert(f.hasDefault && f.otherBin >= 0)
    // bucket leaders rebuilt from the content group leaders
    assert(f.leaderToBin.nonEmpty)
    val df = spark.read.option("header", "true").csv(resource("ref_saved_nested.csv"))
      .select(col("row").cast("long"), col("city"), col("region"), col("t_city").cast("int"))
    val out = m.transform(df, keepOriginal = true)
    val bad = out.filter(col("city_bin") =!= col("t_city")).limit(5).collect()
    assert(bad.isEmpty, s"nested transform mismatch: ${bad.mkString("; ")}")
    // X4 from the LOADED artifact: unseen city with a leader parent resolves
    // through the walk; unresolved unseen falls to the default bucket
    val planted = Seq((1L, "unseen_city", "paca"), (2L, "unseen_city", "nowhere"))
      .toDF("row", "city", "region")
    val got = m.transform(planted, keepOriginal = true).select("row", "city_bin")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // paca rolled into a bin at fit: its bucket leader bin, else default
    assert(got(2L) == f.otherBin)
    assert(got(1L) == f.leaderToBin.getOrElse("paca", f.otherBin))
  }

  test("reference-saved OneVsRestCarver artifact: per-class versions regroup and transform identically") {
    val m = RefJson.loadOneVsRest(resource("ref_saved_OneVsRestCarver.json"))
    assert(m.classes == Vector("low", "mid"), m.classes.toString)
    m.classes.foreach(c => assert(m.perClass(c).kept.map(_.name).toSet == Set("num_a", "cat_a")))
    val df = spark.read.option("header", "true").csv(resource("ref_saved_onevsrestcarver.csv"))
      .select(col("row").cast("long"), col("num_a").cast("double"), col("cat_a"),
        col("t_num_a_Y_low").cast("int"), col("t_cat_a_Y_low").cast("int"),
        col("t_num_a_Y_mid").cast("int"), col("t_cat_a_Y_mid").cast("int"))
    val out = m.transform(df)
    val bad = out.filter(
      col("num_a__y=low_bin") =!= col("t_num_a_Y_low") ||
      col("cat_a__y=low_bin") =!= col("t_cat_a_Y_low") ||
      col("num_a__y=mid_bin") =!= col("t_num_a_Y_mid") ||
      col("cat_a__y=mid_bin") =!= col("t_cat_a_Y_mid")).limit(5).collect()
    assert(bad.isEmpty, s"OvR transform mismatch: ${bad.mkString("; ")}")
    // engine round-trip: write -> read preserves classes and transforms
    val outDir = java.nio.file.Paths.get("target/refjson_families")
    java.nio.file.Files.createDirectories(outDir)
    val p = outDir.resolve("ours_ovr.json")
    java.nio.file.Files.writeString(p, RefJson.writeOneVsRest(m))
    val back = RefJson.readOneVsRest(java.nio.file.Files.readString(p))
    assert(back.classes == m.classes)
    val a = m.transform(df).select(col("row"), col("num_a__y=low_bin"), col("cat_a__y=mid_bin"))
      .collect().map(_.toSeq).toSet
    val b = back.transform(df).select(col("row"), col("num_a__y=low_bin"), col("cat_a__y=mid_bin"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("engine-written family artifacts round-trip (write -> read, same transform + rate state)") {
    val outDir = java.nio.file.Paths.get("target/refjson_families")
    java.nio.file.Files.createDirectories(outDir)

    // ordinal
    val dfo = famDf("OrdinalCarver", "int")
    val mo = OrdinalCarver.fit(dfo, "y", Seq(
      BinaryCarver.FeatureSpec("num_a", "quantitative"),
      BinaryCarver.FeatureSpec("cat_a", "categorical")),
      config = OrdinalCarver.Config(minFreq = 0.05, maxNMod = 5))
    val po = outDir.resolve("ours_ordinal.json")
    java.nio.file.Files.writeString(po, RefJson.writeOrdinal(mo))
    val bo = RefJson.readOrdinal(java.nio.file.Files.readString(po))
    assert(bo.levels == mo.levels)
    val ao = mo.transform(dfo).select("row", "num_a", "cat_a").collect().toSet
    val bo2 = bo.transform(dfo).select("row", "num_a", "cat_a").collect().toSet
    assert(ao == bo2)
    val ridA = mo.kept.head.rateRef.asInstanceOf[Ordinal.TargetMeanRidit]
    val ridB = bo.kept.find(_.feature.name == mo.kept.head.feature.name).get
      .rateRef.asInstanceOf[Ordinal.TargetMeanRidit]
    assert(ridA.refLevels.sameElements(ridB.refLevels) && ridA.refCounts.sameElements(ridB.refCounts))

    // multiclass
    val dfm = famDf("MulticlassCarver", "string")
    val mm = MulticlassCarver.fit(dfm, "y", Seq(
      BinaryCarver.FeatureSpec("num_a", "quantitative"),
      BinaryCarver.FeatureSpec("cat_a", "categorical")),
      config = MulticlassCarver.Config(minFreq = 0.05, maxNMod = 5))
    val pm = outDir.resolve("ours_multiclass.json")
    java.nio.file.Files.writeString(pm, RefJson.writeMulticlass(mm))
    val bm = RefJson.readMulticlass(java.nio.file.Files.readString(pm))
    val am = mm.transform(dfm).select("row", "num_a", "cat_a").collect().toSet
    val bm2 = bm.transform(dfm).select("row", "num_a", "cat_a").collect().toSet
    assert(am == bm2)
    val axA = mm.kept.head.rateRef.asInstanceOf[Multiclass.CAScoreRate].axis
    val axB = bm.kept.find(_.feature.name == mm.kept.head.feature.name).get
      .rateRef.asInstanceOf[Multiclass.CAScoreRate].axis
    assert(axA.v1.zip(axB.v1).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    // continuous
    val dfc = famDf("ContinuousCarver", "double")
    val mc = ContinuousCarver.fit(dfc, "y", Seq(
      BinaryCarver.FeatureSpec("num_a", "quantitative"),
      BinaryCarver.FeatureSpec("cat_a", "categorical")),
      config = BinaryCarver.Config(minFreq = 0.05, maxNMod = 5, sortBy = "kruskal"))
    val pc = outDir.resolve("ours_continuous.json")
    java.nio.file.Files.writeString(pc, RefJson.writeContinuous(mc))
    val bc = RefJson.readContinuous(java.nio.file.Files.readString(pc))
    val ac = mc.transform(dfc).select("row", "num_a", "cat_a").collect().toSet
    val bc2 = bc.transform(dfc).select("row", "num_a", "cat_a").collect().toSet
    assert(ac == bc2)
    mc.kept.zip(bc.kept.sortBy(f => mc.kept.indexWhere(_.name == f.name))).foreach { case (a, b) =>
      a.stds.zip(b.stds).foreach { case (x, y) =>
        assert((x.isNaN && y.isNaN) || math.abs(x - y) < 1e-9, s"${a.name} std $x vs $y")
      }
    }
  }
}
