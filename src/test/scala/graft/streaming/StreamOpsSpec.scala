package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming session windows close at the gap and match batch sessionize counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user", "v")
    val sessions = StreamOps.sessionAgg(events, "ts", "user", "30 minutes", "0 seconds", "v")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    input.addData(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:10:00"), 1L, 2.0),  // same session (gap 10m)
      (ts("2024-01-01 01:00:00"), 1L, 3.0),  // new session (gap 50m)
      (ts("2024-01-01 00:00:00"), 2L, 4.0)
    )
    q.processAllAvailable()
    // watermark advances at batch END: feed a far-future sentinel, then an
    // extra batch so the closed sessions flush from state
    input.addData((ts("2024-01-02 00:00:00"), 99L, 0.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-03 00:00:00"), 99L, 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_out")
      .filter(col("user") =!= 99)
      .select("user", "n_events", "total").as[(Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 2L, 3.0)), out.toString)  // first session of user 1
    assert(out.contains((1L, 1L, 3.0)))                // second session of user 1
    assert(out.contains((2L, 1L, 4.0)))
  }

  test("streaming tumbling agg equals the batch groupBy on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user", "v")
    val agg = StreamOps.tumblingAgg(events, "ts", "user", "1 hour", "0 seconds", "v")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("tumbling_out").start()
    val data = Seq(
      (ts("2024-01-01 00:05:00"), 1L, 1.0),
      (ts("2024-01-01 00:55:00"), 1L, 2.0),
      (ts("2024-01-01 01:05:00"), 1L, 4.0)
    )
    input.addData(data: _*)
    q.processAllAvailable()
    input.addData((ts("2024-01-02 00:00:00"), 99L, 0.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-03 00:00:00"), 99L, 0.0))
    q.processAllAvailable()
    q.stop()
    val streamOut = spark.table("tumbling_out").filter(col("user") =!= 99)
      .select("user", "n", "total").as[(Long, Long, Double)].collect().toSet
    val batchOut = data.toDF("ts", "user", "v").filter(col("user") =!= 99)
      .groupBy(window(col("ts"), "1 hour"), col("user"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select("user", "n", "total").as[(Long, Long, Double)].collect().toSet
    assert(streamOut == batchOut, s"stream=$streamOut batch=$batchOut")
  }
}
