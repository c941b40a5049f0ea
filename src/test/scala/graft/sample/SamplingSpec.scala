package graft.sample

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting + sequence packing invariants. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = (0 until 2000).map { i =>
    (i.toLong, s"host${i % 37}", if (i % 5 == 0) "en" else if (i % 5 == 1) "de" else "fr",
      10L + (i % 90))
  }.toDF("id", "host", "lang", "tokens")

  test("hashSplit is deterministic, partition-independent, and near the asked fraction") {
    val a = Sampling.hashSplit(docs, "id", 0.2).select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.repartition(13), "id", 0.2).select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // no RNG, no partition dependence
    val testFrac = a.values.count(_ == "test").toDouble / a.size
    assert(math.abs(testFrac - 0.2) < 0.05, testFrac.toString)
    // a different seed reassigns
    val c = Sampling.hashSplit(docs, "id", 0.2, seed = 7L).select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c != a)
  }

  test("groupSplit never splits a group across train/test (leakage-safe)") {
    val out = Sampling.groupSplit(docs, "host", 0.3)
    val perHost = out.groupBy("host").agg(countDistinct("split").as("n")).collect()
    assert(perHost.forall(_.getLong(1) == 1L))
    // and both sides are populated
    val sides = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(sides == Set("train", "test"))
  }

  test("stratifiedSample keeps per-stratum fractions; unlisted strata get the default") {
    val kept = Sampling.stratifiedSample(docs, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.25), defaultFrac = 0.0)
    val byLang = kept.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr")) // default 0.0 drops unlisted strata
    assert(math.abs(byLang("en") / 400.0 - 0.5) < 0.1, byLang.toString)
    assert(math.abs(byLang("de") / 400.0 - 0.25) < 0.1, byLang.toString)
  }

  test("packSequences: budget respected, id order within sequences, blocks independent") {
    val packed = graft.text.Packing.packSequences(docs, "id", "tokens", budget = 300L, blockSize = 128L)
      .cache()
    assert(packed.count() == 2000) // every doc packed exactly once
    val stats = graft.text.Packing.sequenceStats(packed, 300L).collect()
    // no multi-doc sequence exceeds the budget
    stats.foreach(r => assert(r.getLong(2) == 1L || r.getLong(3) <= 300L,
      s"seq over budget: $r"))
    // ids increase with (seq, pos) inside a block, positions are dense
    val rows = packed.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(0)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3))
      assert(sorted.map(_._4).sliding(2).forall { case Array(a, b) => a < b; case _ => true })
    }
    // deterministic under repartitioning
    val again = graft.text.Packing.packSequences(docs.repartition(17), "id", "tokens",
      budget = 300L, blockSize = 128L).collect().map(_.toSeq).toSet
    assert(again == packed.collect().map(_.toSeq).toSet)
  }

  test("packSequences: a doc longer than the budget gets its own sequence, kept whole") {
    val d = Seq((1L, 50L), (2L, 500L), (3L, 60L)).toDF("id", "tokens")
    val out = graft.text.Packing.packSequences(d, "id", "tokens", budget = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((0L, 0L, 50L)))
    assert(out(2L) == ((1L, 0L, 500L))) // own sequence, not truncated
    assert(out(3L) == ((2L, 0L, 60L)))
  }

  test("packSequences: signed ids block by floorDiv — no double-wide block 0") {
    // truncating `/` would fold all of (-100, 100) into block 0 (199 rows);
    // floorDiv keeps the per-block memory bound exact for signed id spaces
    val d = Seq((-150L, 10L), (-100L, 10L), (-1L, 10L), (0L, 10L), (99L, 10L), (100L, 10L))
      .toDF("id", "tokens")
    val blocks = graft.text.Packing.packSequences(d, "id", "tokens", budget = 100L, blockSize = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blocks == Map(-150L -> -2L, -100L -> -1L, -1L -> -1L,
      0L -> 0L, 99L -> 0L, 100L -> 1L), blocks.toString)
  }
}
