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

  test("proximityJoin: equals the naive inequality self-join, including bucket-boundary pairs") {
    import org.apache.spark.sql.functions._
    // pairs that straddle a 5-minute bucket edge (10:04:59 → 10:05:01),
    // sit exactly at the window bound (Δ = 5:00 inclusive), and exceed it
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:04:59"), 2L),
      (1L, ts("2024-01-01 10:05:01"), 3L),   // 2→3 straddles the bucket edge
      (1L, ts("2024-01-01 10:09:59"), 4L),   // 2→4 is exactly 5:00 → kept
      (1L, ts("2024-01-01 10:20:00"), 5L),   // > 5 min from everything
      (2L, ts("2024-01-01 10:00:30"), 6L))   // other key, never pairs with key 1
      .toDF("user_id", "ts", "event_id")
    val got = Temporal.proximityJoin(rows, "user_id", "ts", "event_id", 5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive inequality join on RENAMED projections (a plain self-join
    // alias silently resolves both sides to one lineage — the classic
    // trivially-true-predicate trap)
    val aDf = rows.select($"user_id", $"ts".as("ats"), $"event_id".as("aid"))
    val bDf = rows.select($"user_id".as("buser"), $"ts".as("bts"), $"event_id".as("bid"))
    val naive = aDf.join(bDf,
        $"user_id" === $"buser" && $"bts" > $"ats" &&
          unix_micros($"bts") - unix_micros($"ats") <= 300000000L)
      .select($"aid", $"bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    // note (1,3) is Δ = 5:01 → correctly excluded; (2,4) is Δ = 5:00 → kept
    assert(got == Set((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("proximityJoin plan: equi-join on (key, bucket) — no cartesian, no range join") {
    val events = graft.core.Tables(spark, TestSpark.sf0001).events
      .select($"user_id", $"ts", $"event_id")
    val q = Temporal.proximityJoin(events, "user_id", "ts", "event_id", 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"), plan)
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
