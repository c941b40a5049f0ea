package graft.temporal

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks latest build row at or before probe ts, per key") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (1L, ts("2024-01-01 09:00:00"), "p0"), // before any build row
      (2L, ts("2024-01-01 10:30:00"), "p3")
    ).toDF("k", "pts", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 12:00:00"), 30.0), // exactly simultaneous with p2
      (2L, ts("2024-01-01 10:00:00"), 40.0)
    ).toDF("k", "bts", "v")

    val out = Temporal.asOfJoin(probe, build, Seq("k"), "pts", "bts", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out("p0").isEmpty)          // no build row yet
    assert(out("p1").contains(10.0))   // 09:30 row
    assert(out("p2").contains(30.0))   // inclusive: build at equal ts wins
    assert(out("p3").contains(40.0))
  }

  test("sessionize splits strictly-greater-than-gap and is 0-based per key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),  // gap 600s <= 1800 → same session
      (1L, ts("2024-01-01 00:40:01"), 3L),  // gap 1801s > 1800 → new session
      (1L, ts("2024-01-01 01:10:01"), 4L),  // gap exactly 1800s → same session
      (2L, ts("2024-01-01 00:00:00"), 5L)
    ).toDF("user", "t", "id")
    val out = Temporal.sessionize(df, Seq("user"), "t", 1800L, Seq("id"))
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 1 && out(4L) == 1 && out(5L) == 0)
  }

  test("backfill forward-fills nulls per key in ts order") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(5.0), 1L),
      (1L, ts("2024-01-01 00:01:00"), None, 2L),
      (1L, ts("2024-01-01 00:02:00"), Some(7.0), 3L),
      (1L, ts("2024-01-01 00:03:00"), None, 4L),
      (2L, ts("2024-01-01 00:00:00"), None, 5L)
    ).toDF("user", "t", "v", "id")
    val out = Temporal.backfill(df, Seq("user"), "t", Seq("v"), Seq("id"))
      .select("id", "v_filled").as[(Long, Option[Double])].collect().toMap
    assert(out(2L).contains(5.0) && out(4L).contains(7.0) && out(5L).isEmpty)
  }

  test("lagLead emits shifted values per key") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0)).toDF("k", "o", "v")
    val out = Temporal.lagLead(df, Seq("k"), Seq("o"), "v")
      .select("o", "v_lag1", "v_lead1").as[(Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (None, Some(20.0)))
    assert(out(2L) == (Some(10.0), Some(30.0)))
    assert(out(3L) == (Some(20.0), None))
  }
}
