package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the temporal operators: the same logical
  * features computed incrementally with watermarked state. Batch and
  * streaming share these definitions (a `DataFrame` in, a `DataFrame`
  * out — Spark plans them micro-batch when the source is streaming).
  */
object StreamOps {

  /** Tumbling-window counts/sums per key with a lateness watermark.
    * State: one row per (window, key), dropped once the watermark passes.
    */
  def tumblingAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String,
      watermarkDelay: String,
      valueCol: String
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"), col("total"))

  /** Gap-based session aggregation via `session_window` — the streaming
    * equivalent of [[graft.temporal.Temporal.sessionize]]: a session closes
    * when no event arrives within `gap`, emitted once the watermark passes
    * its end.
    */
  def sessionAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermarkDelay: String,
      valueCol: String
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"), col("total"))

  /** Windowed PSI drift of a fitted feature's bin distribution against its
    * fit-time reference frequencies — the streaming form of the M1 monitor
    * ([[graft.stability.Stability.psi]], `stability/metrics.py` PSI): score
    * the stream with a fitted carver (`model.transform`, a pure projection),
    * then feed the bin column here.
    *
    * ONE stateful aggregation per tumbling window (state: a single row of K
    * conditional bin counts per window, dropped once the watermark passes)
    * followed by a STATELESS projection computing PSI — exactly the batch
    * math: both sides clamped at `epsilon`, renormalized, Σ (n−r)·ln(n/r).
    * The reference side is constant-folded on the driver. Append mode, so
    * each window emits exactly one final (window_start, n, psi) row.
    *
    * Rows with a null bin code contribute to no bucket; a window containing
    * only null bins reports NaN (no distribution to compare), mirroring the
    * batch monitor's NaN propagation.
    */
  def psiDriftStream(
      scored: DataFrame,
      tsCol: String,
      binCol: String,
      refFreq: Seq[Double],
      windowLen: String,
      watermarkDelay: String,
      epsilon: Double = 1e-6
  ): DataFrame = {
    require(refFreq.nonEmpty, "[psiDriftStream] refFreq is empty")
    val refClamped = refFreq.map(math.max(_, epsilon))
    val rs = refClamped.sum
    val r = refClamped.map(_ / rs)
    val cnts = refFreq.indices.map(i =>
      sum((col(binCol) === i).cast("long")).as(s"__c$i"))
    val agg = scored
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen))
      .agg(cnts.head, cnts.tail: _*)
    val total = refFreq.indices.map(i => coalesce(col(s"__c$i"), lit(0L))).reduce(_ + _).cast("double")
    val nw = refFreq.indices.map(i => greatest(col(s"__c$i").cast("double") / total, lit(epsilon)))
    val ns = nw.reduce(_ + _)
    val psi = refFreq.indices.map { i =>
      val n = nw(i) / ns
      (n - lit(r(i))) * log(n / lit(r(i)))
    }.reduce(_ + _)
    agg.select(
      col("window.start").as("window_start"),
      total.cast("long").as("n"),
      when(total > 0, psi).otherwise(lit(Double.NaN)).as("psi"))
  }

  /** Streaming first-seen dedup with TTL'd custom state
    * (`flatMapGroupsWithState`): emits only the FIRST event per key; the
    * per-key seen-marker is dropped by event-time timeout once the
    * watermark passes `ttl` — bounded state on an unbounded stream, the
    * ingest-time exact-dedup a web-crawl pipeline runs in front of the
    * batch near-dup stages. Works identically on a batch frame (state
    * spans the whole batch; no timeout semantics needed).
    *
    * Input needs (keyCol: string-castable, tsCol: timestamp); emits the
    * first row's (key, ts) per key.
    */
  def dedupFirstSeen(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      watermarkDelay: String,
      ttl: String
  ): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // watermark AFTER the projection: re-aliasing the event-time column
    // would detach the watermark tag and EventTimeTimeout rejects the plan
    val keyed = events
      .select(col(keyCol).cast("string").as("k"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
    val ttlMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    // a CalendarInterval month has no fixed millisecond length — silently
    // dropping it would turn ttl="1 month" into ttlMillis=0 (state expires
    // immediately, duplicates re-emitted). Reject instead of guessing.
    require(ttlMs.months == 0, s"ttl '$ttl' uses months — specify days/hours/minutes instead")
    val ttlMillis = ttlMs.days * 86400000L + ttlMs.microseconds / 1000L
    require(ttlMillis > 0, s"ttl '$ttl' must be positive")
    val streaming = events.isStreaming
    keyed.flatMapGroupsWithState[Long, (String, java.sql.Timestamp)](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: String, rows: Iterator[(String, java.sql.Timestamp)], state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else if (state.exists) {
          Iterator.empty // key already seen within the TTL
        } else {
          val first = rows.minBy(_._2.getTime)
          state.update(first._2.getTime)
          if (streaming) {
            // a timeout at or below the current watermark is rejected by
            // the state store — clamp to watermark+1 so late first-seen
            // events still register SOME timeout (never silently skip it:
            // a key with no timeout would pin its state forever, the exact
            // leak the TTL exists to prevent)
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(wm + 1L, first._2.getTime + ttlMillis))
          }
          // batch execution has no watermark/timeout machinery — state
          // lives for the single batch and the TTL is moot there
          Iterator.single(first)
        }
    }.toDF("k", "first_ts").withColumnRenamed("k", keyCol)
  }
}
