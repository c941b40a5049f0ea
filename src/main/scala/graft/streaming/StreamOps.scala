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
}
