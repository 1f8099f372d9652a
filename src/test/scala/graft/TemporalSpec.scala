package graft

import java.sql.Timestamp

import graft.ops.Temporal

/** Generic as-of join / sessionization semantics on hand-built frames. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: picks latest right ≤ left, ties to larger tiebreak, null when none") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:05:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L)
    ).toDF("acct", "trade_ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1L, 10.0),
      (1L, ts("2024-01-01 10:00:00"), 2L, 11.0), // equal ts: eligible (≤)
      (1L, ts("2024-01-01 10:00:00"), 3L, 12.0), // same ts, larger tie wins
      (1L, ts("2024-01-01 10:04:00"), 4L, 13.0),
      (2L, ts("2024-01-01 09:30:00"), 5L, 20.0)  // after the only acct-2 trade
    ).toDF("acct", "quote_ts", "quote_id", "price")

    val out = Temporal.asof(trades, quotes, on = "acct",
      leftTs = "trade_ts", rightTs = "quote_ts",
      rightPayload = Seq("quote_id", "price"), rightTieBreak = "quote_id")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[java.lang.Long]("asof_quote_id")), Option(r.getAs[Any]("asof_price"))))
      .toMap

    assert(out(100L)._1.contains(3L)) // equal-ts quote, larger quote_id
    assert(out(101L)._1.contains(4L)) // latest before 10:05
    assert(out(102L)._1.isEmpty)      // no quote ≤ 09:00 for acct 2
  }

  test("asof: left columns pass through unchanged, one row per left row") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "keep-me")).toDF("k", "lts", "tag")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 7L)).toDF("k", "rts", "rid")
    val out = Temporal.asof(left, right, "k", "lts", "rts", Seq("rid"), "rid").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("tag") == "keep-me")
    assert(out(0).getAs[Long]("asof_rid") == 7L)
  }

  test("sessionize: splits on gap, session ids are 1-based and monotonic") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),  // same session (10 min)
      (1L, ts("2024-01-01 11:00:00"), 3L),  // new session (50 min gap)
      (1L, ts("2024-01-01 11:20:00"), 4L),
      (2L, ts("2024-01-01 10:00:00"), 5L)
    ).toDF("uid", "t", "eid")
    val out = Temporal.sessionize(df, "uid", "t", "eid", gapMinutes = 30)
      .collect().map(r => r.getAs[Long]("eid") -> r.getAs[Long]("session_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize: a gap of exactly the threshold does NOT split") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L) // exactly 30 min
    ).toDF("uid", "t", "eid")
    val out = Temporal.sessionize(df, "uid", "t", "eid", 30)
      .collect().map(_.getAs[Long]("session_id")).distinct
    assert(out.sameElements(Array(1L)))
  }
}
