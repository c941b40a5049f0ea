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
