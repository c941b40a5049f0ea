package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = {
    val rows = (0L until 100L).map { i =>
      val payload = if (i % 10 == 9) null else Array.tabulate((i % 50 + 5).toInt)(j => (i + j).toByte)
      (i, payload)
    }
    rows.toDF("id", "payload")
  }

  test("extractFeatures: schema, null-safety, deterministic stub embedding") {
    val out = Multimodal.extractFeatures(media, "id", "payload", dim = 8)
    assert(out.columns.toSeq == Seq("id", "payload", "ok", "byte_len", "sha256", "embedding"))
    assert(out.count() == 100)
    val bad = out.filter(!col("ok")).count()
    assert(bad == 10, s"null payloads must map to ok=false, got $bad")
    // deterministic across runs
    val e1 = out.filter(col("id") === 5).select("embedding").as[Seq[Float]].head()
    val e2 = Multimodal.extractFeatures(media, "id", "payload", dim = 8)
      .filter(col("id") === 5).select("embedding").as[Seq[Float]].head()
    assert(e1 == e2 && e1.length == 8)
    // sha256 matches a local digest
    val row5 = media.filter(col("id") === 5).select("payload").as[Array[Byte]].head()
    val sha = out.filter(col("id") === 5).select("sha256").as[String].head()
    assert(sha == Multimodal.sha256Hex(row5))
  }

  test("sampleFrames: n frames per non-empty payload, bounded frame size") {
    val out = Multimodal.sampleFrames(media.filter(col("payload").isNotNull), "id", "payload", n = 4, frameBytes = 8)
    assert(out.columns.toSeq == Seq("id", "frame_idx", "frame"))
    val counts = out.groupBy("id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 4))
    val maxLen = out.select(max(length(col("frame")))).as[Int].head()
    assert(maxLen <= 8)
  }
}
