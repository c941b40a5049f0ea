package graft.sim

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteTopK ranks by cosine, deterministic tie-break") {
    val out = Similarity.bruteTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .orderBy("rank").select("nid").as[Long].collect()
    assert(out.sameElements(Array(1L, 2L)) || (out(0) == 1L)) // 1 is closest
    assert(out(0) == 1L)
  }

  test("lshTopK recall vs brute force on the testdata embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 8)
    val brute = Similarity.bruteTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 5, nBits = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.2, s"recall=$recall") // single-probe 2-bit LSH: coarse but nonzero
  }

  test("hyperplanes and buckets are deterministic") {
    val p1 = Similarity.hyperplanes(4, 8)
    val p2 = Similarity.hyperplanes(4, 8)
    assert(p1.flatMap(_.toSeq).sameElements(p2.flatMap(_.toSeq)))
    val v = Array.tabulate(8)(i => math.sin(i.toDouble))
    assert(Similarity.signBucket(v, p1) == Similarity.signBucket(v, p2))
  }
}
