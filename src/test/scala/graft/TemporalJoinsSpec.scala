package graft

import graft.ext.TemporalJoins
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** As-of and interval join semantics over tiny hand-checked event
  * sets (driver-scale coverage lives in x15/x16 + the DuckDB oracle). */
class TemporalJoinsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (2L, ts("2024-01-01 10:02:00"), 200.0))
    .toDF("key", "ts", "px")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:03:00"), "t1"),  // matches 10:00 quote
    (1L, ts("2024-01-01 10:05:00"), "t2"),  // equal ts -> inclusive match
    (2L, ts("2024-01-01 10:01:00"), "t3"),  // before any quote -> null
    (3L, ts("2024-01-01 10:00:00"), "t4"))  // key with no quotes -> null
    .toDF("key", "ts", "tag")

  test("asofJoin: latest right at-or-before, inclusive, null when none") {
    val out = TemporalJoins.asofJoin(trades, quotes, "key", "ts", Seq("px"))
      .select($"tag", $"right_px")
      .as[(String, Option[Double])].collect().toMap
    assert(out("t1").contains(100.0))
    assert(out("t2").contains(101.0)) // ts == right ts counts
    assert(out("t3").isEmpty && out("t4").isEmpty)
    // left row count preserved
    assert(out.size == 4)
  }

  test("asofJoin carries the matched right row atomically (no payload tearing)") {
    // the matched (latest) right row has a NULL payload field; a
    // per-column last(ignoreNulls) would backfill it from the older row
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 10:01:00"), None))
      .toDF("key", "ts", "px")
    val left = Seq((1L, ts("2024-01-01 10:02:00"), "L")).toDF("key", "ts", "tag")
    val out = TemporalJoins.asofJoin(left, right, "key", "ts", Seq("px"))
      .select($"right_ts", $"right_px").collect().head
    assert(out.getTimestamp(0) == ts("2024-01-01 10:01:00"))
    assert(out.isNullAt(1), "null payload of the matched row must survive")
  }

  test("intervalJoin: pairs within lookback, inclusive bounds, no dups") {
    val out = TemporalJoins.intervalJoin(trades, quotes, "key", "ts",
        Seq("px"), lookbackMs = 3 * 60 * 1000)
      .select($"tag", $"right_px").as[(String, Double)].collect().sorted
    // t1@10:03 window [10:00,10:03] -> quote 10:00 only
    // t2@10:05 window [10:02,10:05] -> quote 10:05 only (10:00 outside)
    // t3 window has no quotes; t4 key unmatched
    assert(out.toSeq == Seq(("t1", 100.0), ("t2", 101.0)))
  }

  test("intervalJoin matches across bucket boundaries") {
    // right row in the bucket PRECEDING the left row's bucket
    val l = Seq((1L, ts("2024-01-01 10:00:30"), "L")).toDF("key", "ts", "tag")
    val r = Seq((1L, ts("2024-01-01 09:59:50"), 7.0)).toDF("key", "ts", "px")
    val out = TemporalJoins.intervalJoin(l, r, "key", "ts", Seq("px"),
      lookbackMs = 60 * 1000)
    assert(out.count() == 1)
  }
}
