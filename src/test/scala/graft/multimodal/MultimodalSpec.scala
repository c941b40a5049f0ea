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

  test("decodeImages: real JDK PNG decode, integer-math resize, corrupt-safe") {
    // synthetic gray PNG with a closed-form pixel function: the decode must
    // read back every sample exactly (PNG gray is lossless)
    def g(x: Int, y: Int, seed: Long): Int = ((x * 7 + y * 13 + seed * 31) % 256).toInt
    val rows = (0L until 20L).map { id =>
      val (w, h) = ((4 + id % 13).toInt, (3 + id % 7).toInt)
      (id, Multimodal.synthPng(id, w, h), w, h)
    }
    val df = rows.toDF("id", "png", "w", "h")
    val out = Multimodal.decodeImages(df, "png", outW = 4, outH = 3).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (r.getInt(2), r.getInt(3))
      assert(r.getBoolean(r.fieldIndex("ok")))
      assert((w, h) == ((4 + id % 13).toInt, (3 + id % 7).toInt))
      val expSum = (for { y <- 0 until h; x <- 0 until w } yield g(x, y, id).toLong).sum
      assert(r.getLong(r.fieldIndex("pixel_sum")) == expSum, s"doc $id pixel sum")
      // nearest-neighbor with explicit integer indexing: src = x*W/outW
      val expResized = for { y <- 0 until 3; x <- 0 until 4 } yield g(x * w / 4, y * h / 3, id)
      assert(r.getSeq[Int](r.fieldIndex("resized")) == expResized, s"doc $id resize")
    }
    // corrupt + null payloads -> ok=false rows, not task failures
    val bad = Seq((100L, Array[Byte](1, 2, 3)), (101L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "png")
    val badOut = Multimodal.decodeImages(bad, "png").collect()
    assert(badOut.forall(r => !r.getBoolean(r.fieldIndex("ok"))))
  }

  test("decodeAudio: real JDK WAV PCM decode, exact sums, corrupt-safe") {
    def sample(i: Long, seed: Long): Long = ((i * 2654435761L + seed * 40503L) % 65536L) - 32768L
    val rows = (0L until 12L).map { id =>
      (id, Multimodal.synthWav(id, (50 + id % 30).toInt, (8000 + (id % 3) * 4000).toInt))
    }
    val out = Multimodal.decodeAudio(rows.toDF("id", "wav"), "wav").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val n = (50 + id % 30).toInt
      assert(r.getBoolean(r.fieldIndex("ok")))
      assert(r.getInt(r.fieldIndex("channels")) == 1)
      assert(r.getInt(r.fieldIndex("sample_rate")) == (8000 + (id % 3) * 4000).toInt)
      assert(r.getLong(r.fieldIndex("n_frames")) == n)
      val samples = (0L until n).map(sample(_, id))
      assert(r.getLong(r.fieldIndex("sample_sum")) == samples.sum, s"doc $id")
      assert(r.getLong(r.fieldIndex("peak")) == samples.map(math.abs).max, s"doc $id")
    }
    val bad = Seq((100L, Array[Byte](82, 73, 70, 70)), (101L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "wav")
    val badOut = Multimodal.decodeAudio(bad, "wav").collect()
    assert(badOut.forall(r => !r.getBoolean(r.fieldIndex("ok"))))
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
