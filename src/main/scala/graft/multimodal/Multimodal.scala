package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-mapped batch functions.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * kernels are deterministic STUBS (clearly marked) — the Spark-side
  * contract is real and tested: schema, null/corrupt-row behavior,
  * per-partition batching (one decoder instance per partition, amortized
  * like a Pandas UDF's per-batch model load), and partition sizing so a
  * 100 TB media table maps to bounded-memory tasks.
  */
object Multimodal {

  /** Typed metadata a media ingest carries next to the payload. */
  final case class MediaMeta(
      mimeType: String,
      width: Int,
      height: Int,
      durationMs: Long
  )

  final case class MediaFeatures(
      ok: Boolean,
      byteLen: Long,
      sha256: String,
      embedding: Array[Float]
  )

  // ------------------------------------------------------------- stubs
  // STUB: a real implementation would decode the image/audio bytes here
  // (e.g. via javax.imageio / ffmpeg bindings). This deterministic fake
  // derives a fixed-dimension "embedding" from the payload bytes so the
  // plumbing is testable end-to-end and reproducible across runs.
  def stubDecodeEmbedding(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null) return out
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i) & 0xffL
      h *= 0x100000001b3L
      out(i % dim) += ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  // STUB: frame sampling — a real implementation seeks the container's
  // keyframes; the fake slices the payload into `n` evenly-spaced windows.
  def stubFrameSample(payload: Array[Byte], n: Int, frameBytes: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty || n <= 0) return Seq.empty
    (0 until n).map { i =>
      val start = (payload.length.toLong * i / n).toInt
      payload.slice(start, math.min(start + frameBytes, payload.length))
    }
  }

  /** sha256: the content-address every engine (incl. the DuckDB oracle)
    * can recompute — sha1 is absent from DuckDB 1.x.
    */
  def sha256Hex(b: Array[Byte]): String =
    if (b == null) ""
    else java.security.MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  // -------------------------------------------------- dataset operators

  /** Decode + feature-extract over a binary column, batch-shaped: one
    * decoder context per partition (the mapPartitions analogue of a
    * Pandas-UDF batch), null-safe, never throws on a corrupt payload.
    *
    * Input: (idCol: long, payloadCol: binary). Output adds a struct
    * `media_features (ok, byte_len, sha256, embedding)`.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16): DataFrame = {
    val schema = df.schema
      .add("ok", "boolean")
      .add("byte_len", "long")
      .add("sha256", "string")
      .add("embedding", org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition decoder init happens HERE (amortized across the batch)
      rows.map { row =>
        val payload =
          if (row.isNullAt(payloadIdx)) null else row.getAs[Array[Byte]](payloadIdx)
        val feats =
          try {
            if (payload == null) MediaFeatures(ok = false, 0L, "", new Array[Float](dim))
            else MediaFeatures(ok = true, payload.length.toLong, sha256Hex(payload),
              stubDecodeEmbedding(payload, dim))
          } catch {
            case _: Throwable => MediaFeatures(ok = false, 0L, "", new Array[Float](dim))
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(feats.ok, feats.byteLen, feats.sha256, feats.embedding.toSeq))
      }
    }(enc)
  }

  /** REAL image decode kernel (L9 upgrade): the JDK ships PNG/JPEG/BMP/GIF
    * readers in `javax.imageio` — no external jars. Batch-shaped like
    * [[extractFeatures]]: one decode per row inside a mapPartitions pass
    * (reader instances amortize per partition), corrupt / undecodable /
    * null payloads produce an `ok=false` row, never a task failure.
    *
    * Appends: `ok boolean, width int, height int, pixel_sum long,
    * resized array<int>` — `pixel_sum` sums band-0 samples (gray channel;
    * deterministic across JVMs because PNG gray is lossless), `resized` is
    * a nearest-neighbor downsample to `outW × outH` with explicit integer
    * source indexing (`src = x*W/outW`) rather than AffineTransform
    * filtering, so the result is bit-identical everywhere.
    */
  def decodeImages(df: DataFrame, payloadCol: String, outW: Int = 4, outH: Int = 3): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
      .add("ok", BooleanType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("pixel_sum", LongType)
      .add("resized", ArrayType(IntegerType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(payloadIdx)) null else row.getAs[Array[Byte]](payloadIdx)
        val img =
          if (payload == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Throwable => null }
        if (img == null)
          org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(false, 0, 0, 0L, Seq.empty[Int]))
        else {
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          val resized = new Array[Int](outW * outH)
          var ry = 0
          while (ry < outH) {
            var rx = 0
            while (rx < outW) {
              resized(ry * outW + rx) = raster.getSample(rx * w / outW, ry * h / outH, 0)
              rx += 1
            }
            ry += 1
          }
          org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(true, w, h, sum, resized.toSeq))
        }
      }
    }(enc)
  }

  /** Deterministic synthetic gray PNG: `gray(x, y) = (x*7 + y*13 +
    * seed*31) % 256`, written through the JDK PNG encoder — the fixture
    * generator for the decode oracle (closed-form pixel function, so a
    * DuckDB oracle recomputes every sum without decoding anything).
    */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((x * 7 + y * 13 + seed * 31) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL audio decode kernel (L9 upgrade): WAV/AIFF/AU PCM via the JDK's
    * `javax.sound.sampled.AudioSystem` — no external jars. Same batch
    * shape and corrupt-safety contract as [[decodeImages]]. Appends:
    * `ok boolean, channels int, sample_rate int, n_frames long,
    * sample_sum long, peak long` (signed 16-bit samples summed exactly;
    * peak = max |sample| — the clipping detector a filtering pipeline
    * gates on). Non-PCM / non-16-bit / undecodable payloads → ok=false.
    */
  def decodeAudio(df: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
      .add("ok", BooleanType)
      .add("channels", IntegerType)
      .add("sample_rate", IntegerType)
      .add("n_frames", LongType)
      .add("sample_sum", LongType)
      .add("peak", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(payloadIdx)) null else row.getAs[Array[Byte]](payloadIdx)
        val decoded =
          try {
            if (payload == null) None
            else {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 ||
                  fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
              else {
                val bytes = ais.readAllBytes()
                val bb = java.nio.ByteBuffer.wrap(bytes).order(
                  if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                  else java.nio.ByteOrder.LITTLE_ENDIAN)
                var sum = 0L
                var peak = 0L
                var n = 0L
                while (bb.remaining >= 2) {
                  val v = bb.getShort.toLong
                  sum += v
                  val a = math.abs(v)
                  if (a > peak) peak = a
                  n += 1
                }
                Some((fmt.getChannels, fmt.getSampleRate.toInt, n / fmt.getChannels, sum, peak))
              }
            }
          } catch { case _: Throwable => None }
        decoded match {
          case Some((ch, rate, frames, sum, peak)) =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(true, ch, rate, frames, sum, peak))
          case None =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(false, 0, 0, 0L, 0L, 0L))
        }
      }
    }(enc)
  }

  /** Deterministic synthetic 16-bit PCM mono WAV: `sample(i) =
    * ((i*2654435761 + seed*40503) % 65536) − 32768`, RIFF header
    * hand-rolled — the fixture generator for the audio decode oracle
    * (closed-form sample function, SQL-recomputable).
    */
  def synthWav(seed: Long, nFrames: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = nFrames * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16).put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      buf.putShort((((i * 2654435761L + seed * 40503L) % 65536L) - 32768L).toShort)
      i += 1
    }
    buf.array()
  }

  /** Frame sampling: one row per sampled frame `(id, frame_idx, frame)`.
    * Partition sizing note: output bytes = n × frameBytes per input row —
    * repartition the input so a task's output stays within executor memory.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, n: Int, frameBytes: Int): DataFrame = {
    import df.sparkSession.implicits._
    val src = df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    src.flatMap { case (id, payload) =>
      stubFrameSample(payload, n, frameBytes).zipWithIndex.map { case (frame, i) => (id, i, frame) }
    }.toDF(idCol, "frame_idx", "frame")
  }
}
