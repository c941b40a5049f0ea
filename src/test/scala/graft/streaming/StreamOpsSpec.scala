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

  test("streaming first-seen dedup: one row per key, repeats dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "fp")
    val out = StreamOps.dedupFirstSeen(events, "fp", "ts", "0 seconds", "1 hour")
    val q = out.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    input.addData(
      (ts("2024-01-01 00:00:00"), "a"),
      (ts("2024-01-01 00:00:05"), "a"),  // dup in the same batch
      (ts("2024-01-01 00:00:10"), "b")
    )
    q.processAllAvailable()
    input.addData((ts("2024-01-01 00:05:00"), "a")) // dup across batches
    q.processAllAvailable()
    input.addData((ts("2024-01-01 00:06:00"), "c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("fp").as[String].collect().sorted.toVector
    assert(got == Vector("a", "b", "c"), got.toString)
    // the batch form: same operator over a static frame
    val batch = Seq((ts("2024-01-01 00:00:00"), "x"), (ts("2024-01-01 00:00:05"), "x"))
      .toDF("ts", "fp")
    val bOut = StreamOps.dedupFirstSeen(batch, "fp", "ts", "0 seconds", "1 hour")
    assert(bOut.count() == 1)
  }

  test("dedupFirstSeen rejects month-based and non-positive TTLs") {
    val batch = Seq((ts("2024-01-01 00:00:00"), "x")).toDF("ts", "fp")
    // CalendarInterval months have no fixed millisecond length — silently
    // dropping them would yield ttlMillis=0 (state expires instantly)
    intercept[IllegalArgumentException] {
      StreamOps.dedupFirstSeen(batch, "fp", "ts", "0 seconds", "1 month")
    }
    intercept[IllegalArgumentException] {
      StreamOps.dedupFirstSeen(batch, "fp", "ts", "0 seconds", "0 seconds")
    }
  }

  test("streaming PSI drift per window equals the batch Stability.psi on the same codes") {
    import graft.stability.Stability
    implicit val sqlCtx = spark.sqlContext
    val refFreq = Seq(0.5, 0.3, 0.2)
    val input = MemoryStream[(Timestamp, Int)]
    val scored = input.toDF().toDF("ts", "x_bin")
    val drift = StreamOps.psiDriftStream(scored, "ts", "x_bin", refFreq, "1 hour", "0 seconds")
    val q = drift.writeStream.outputMode("append").format("memory").queryName("psi_out").start()
    // window 0: skewed toward bin 0; window 1: matches the reference-ish
    val w0 = Seq.fill(8)(0) ++ Seq.fill(1)(1) ++ Seq.fill(1)(2)
    val w1 = Seq.fill(5)(0) ++ Seq.fill(3)(1) ++ Seq.fill(2)(2)
    input.addData(w0.map(b => (ts("2024-01-01 00:10:00"), b)): _*)
    input.addData(w1.map(b => (ts("2024-01-01 01:10:00"), b)): _*)
    q.processAllAvailable()
    input.addData((ts("2024-01-02 00:00:00"), 0)) // advance watermark
    q.processAllAvailable()
    input.addData((ts("2024-01-03 00:00:00"), 0)) // flush closed windows
    q.processAllAvailable()
    q.stop()
    val got = spark.table("psi_out")
      .filter(col("window_start") < ts("2024-01-01 12:00:00"))
      .select("window_start", "n", "psi").as[(Timestamp, Long, Double)]
      .collect().map(r => r._1.toString -> (r._2, r._3)).toMap
    def batchPsi(bins: Seq[Int]): Double = {
      val counts = refFreq.indices.map(i => bins.count(_ == i).toDouble).toArray
      Stability.psi(refFreq.toArray, counts.map(_ / bins.length))._1
    }
    val (n0, p0) = got("2024-01-01 00:00:00.0")
    val (n1, p1) = got("2024-01-01 01:00:00.0")
    assert(n0 == 10L && n1 == 10L, got.toString)
    assert(math.abs(p0 - batchPsi(w0)) < 1e-9, s"$p0 vs ${batchPsi(w0)}")
    assert(math.abs(p1 - batchPsi(w1)) < 1e-9, s"$p1 vs ${batchPsi(w1)}")
    assert(p0 > p1) // the skewed window drifts more
  }

  test("streaming scoring: a fitted carver model transforms a stream (pure projection)") {
    import graft.carve.BinaryCarver
    implicit val sqlCtx = spark.sqlContext
    // fit on a small batch frame
    val train = (0 until 2000).map { i => ((i % 100).toDouble, if (i % 100 > 60) 1 else 0) }
      .toDF("x", "y")
    val m = BinaryCarver.fit(train, "y", Seq(BinaryCarver.FeatureSpec("x", "quantitative")))
    // score a stream with the same model — transform is shuffle-free, so it
    // plans as a streaming projection without state
    val input = MemoryStream[Double]
    val scored = m.transform(input.toDF().toDF("x"), keepOriginal = true)
    val q = scored.writeStream.outputMode("append").format("memory").queryName("scored_out").start()
    input.addData(10.0, 70.0, 95.0)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scored_out").select("x", "x_bin").as[(Double, Int)].collect().toMap
    val batchCodes = m.transform(Seq(10.0, 70.0, 95.0).toDF("x"), keepOriginal = true)
      .select("x", "x_bin").as[(Double, Int)].collect().toMap
    assert(got == batchCodes, s"stream $got vs batch $batchCodes")
  }
}
