package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.AnalyticsQueries

/** Semantics + plan-shape checks for the §2.2 analytics surface.
  * Value-level correctness is the DuckDB oracle gate (Verify); here we
  * assert the semantics a unit can check fast, and that the physical
  * plans have the shape we want at scale (broadcasts, pushdown). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Tables(spark, TestSpark.sf0001)

  test("q_corr: partition-invariant exact moments, agrees with Spark's corr to 1e-3") {
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getAs[Double]("corr_qty_disc"), r.getAs[Double]("slope"),
         r.getAs[Double]("intercept"))).toMap
    val rows = collectMap(AnalyticsQueries.corrRegression(t.lineitem))
    // bit-identical under any repartitioning — the point vs corr()'s
    // order-dependent double accumulation
    val re = collectMap(AnalyticsQueries.corrRegression(t.lineitem.repartition(13)))
    assert(rows == re)
    // statistical sanity: within rounding noise of the built-in estimate
    val builtin = t.lineitem.groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_discount").as("c")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { case (k, (c, _, _)) =>
      assert(math.abs(c - builtin(k)) < 1e-3, s"corr for $k: $c vs builtin ${builtin(k)}")
    }
  }

  test("q1: aggregates only rows within the shipdate filter") {
    val out = AnalyticsQueries.pricingSummary(t)
    val total = out.agg(sum("count_order")).collect()(0).getLong(0)
    val expected = t.lineitem.filter($"l_shipdate" <= "1998-09-02").count()
    assert(total == expected && expected > 0)
  }

  test("q3: top-k is sorted by revenue desc with orderkey tie-break") {
    val rows = AnalyticsQueries.shippingPriority(t).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 and q_broadcast_dim plans broadcast the dimension side") {
    for (df <- Seq(AnalyticsQueries.localSupplier(t), AnalyticsQueries.broadcastDim(t))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    }
  }

  test("q1 filter is pushed into the parquet scan") {
    val plan = AnalyticsQueries.pricingSummary(t).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$plan")
  }

  test("semi ∪ anti partition customers when predicates align") {
    // semi(P) + anti(P) over the same predicate = all customers, disjoint.
    val withOrders2001 = t.customer.join(
      t.orders.filter($"o_orderdate" >= "2001-01-01"),
      $"c_custkey" === $"o_custkey", "left_semi")
    val anti = AnalyticsQueries.antiJoin(t)
    assert(withOrders2001.count() + anti.count() == t.customer.count())
    assert(withOrders2001.join(anti, Seq("c_custkey"), "inner").count() == 0)
  }

  test("q_window_topn: at most 3 per brand, ranks 1..3, descending prices") {
    val out = AnalyticsQueries.windowTopN(t).collect()
    val byBrand = out.groupBy(_.getAs[String]("p_brand"))
    assert(byBrand.values.forall(_.length <= 3))
    byBrand.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      val prices = sorted.map(_.getAs[Double]("p_retailprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_window_running: running_spend is cumulative per customer") {
    val rows = AnalyticsQueries.windowRunning(t)
      .filter($"o_custkey" === t.orders.select("o_custkey").first().getLong(0))
      .orderBy("o_orderdate", "o_orderkey").collect()
    var acc = BigDecimal(0)
    rows.foreach { r =>
      acc += BigDecimal(r.getAs[Double]("o_totalprice")).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(r.getAs[Double]("running_spend") - acc.toDouble) < 1e-6)
    }
  }

  test("q_rollup: grand total row equals table count") {
    val out = AnalyticsQueries.rollupOrders(t)
    val grand = out.filter($"status" === "ALL" && $"priority" === "ALL").collect()
    assert(grand.length == 1 && grand(0).getAs[Long]("n") == t.orders.count())
  }

  test("q_pivot: pivoted counts sum to row count") {
    val out = AnalyticsQueries.pivotStatus(t)
    val total = out.agg(sum($"n_f" + $"n_o")).collect()(0).getLong(0)
    assert(total == t.lineitem.count())
  }

  test("q_set_ops: intersect ⊆ union, except ∩ intersect = ∅") {
    val out = AnalyticsQueries.setOps(t).collect()
    val by = out.groupBy(_.getAs[String]("op")).view.mapValues(_.map(_.getAs[Int]("nationkey")).toSet)
    val u = by.getOrElse("union", Set.empty)
    val i = by.getOrElse("intersect", Set.empty)
    val e = by.getOrElse("except", Set.empty)
    assert(i.subsetOf(u) && e.subsetOf(u) && (i & e).isEmpty)
  }

  test("q_sessionize: splitting at a 30min gap covers all events exactly once") {
    val out = AnalyticsQueries.sessionize(t)
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == t.events.count())
    // session bounds ordered
    assert(out.filter($"session_start" > $"session_end").count() == 0)
  }

  test("q_event_windows: window starts align to the hour and cover all events") {
    val out = AnalyticsQueries.eventWindows(t)
    assert(out.agg(sum("n")).collect()(0).getLong(0) == t.events.count())
    assert(out.filter(minute($"window_start") =!= 0 || second($"window_start") =!= 0).count() == 0)
  }

  test("q_moving_avg: trailing window contains the row itself and only prior 90 days") {
    val rows = AnalyticsQueries.movingAvg(t).filter($"n_in_window" === 1).collect()
    // a window of one row averages to exactly that row's price
    rows.take(20).foreach { r =>
      assert(r.getAs[Double]("trailing_avg") == r.getAs[Double]("o_totalprice"))
    }
    assert(AnalyticsQueries.movingAvg(t).filter($"n_in_window" < 1).count() == 0)
  }

  test("q_argmax: top order per status really has the max totalprice") {
    val maxes = t.orders.groupBy($"o_orderstatus").agg(max($"o_totalprice").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    AnalyticsQueries.argmaxOrder(t).collect().foreach { r =>
      assert(r.getAs[Double]("top_totalprice") == maxes(r.getAs[String]("o_orderstatus")))
    }
  }

  test("q_ntile: quartiles are 1..4 and sizes differ by at most one per segment") {
    val out = AnalyticsQueries.ntileCustomers(t).collect()
    assert(out.forall(r => (1 to 4).contains(r.getAs[Int]("balance_quartile"))))
    out.groupBy(_.getAs[String]("c_mktsegment")).values.foreach { seg =>
      val sizes = seg.groupBy(_.getAs[Int]("balance_quartile")).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("q_full_outer: preserves unmatched keys from both sides") {
    val out = AnalyticsQueries.fullOuter(t).collect()
    // every row has a non-null key; at least one side may be null
    assert(out.forall(!_.isNullAt(0)))
  }

  test("q_histogram: buckets partition every order; edges at bucket*width") {
    val out = AnalyticsQueries.histogram(t).collect()
    assert(out.map(_.getAs[Long]("n_orders")).sum == t.orders.count())
    out.foreach { r =>
      assert(r.getAs[Double]("bucket_lo") == r.getAs[Long]("bucket") * 20000.0)
    }
    // one scan + one aggregation — no join, no window, single exchange
    val q = AnalyticsQueries.histogram(t)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1, plan)
  }

  test("q_asof_join: click is the latest at-or-before the purchase") {
    val rows = AnalyticsQueries.asofJoin(t).filter($"click_ts".isNotNull).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("click_ts").after(r.getAs[java.sql.Timestamp]("purchase_ts")))
    }
    // one output row per purchase
    val purchases = t.events.filter($"event_type" === "purchase").count()
    assert(AnalyticsQueries.asofJoin(t).count() == purchases)
  }

  test("q_grouping_sets: exactly the three declared sets, margins consistent") {
    val out = AnalyticsQueries.groupingSetsOrders(t).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val total = t.orders.count()
    assert(out(("ALL", "ALL")) == total, "grand total")
    // priority margins present and summing to the total…
    val margins = out.collect { case (("ALL", p), n) if p != "ALL" => n }
    assert(margins.sum == total)
    // …but NO status-only margin (the set rollup/cube would add)
    assert(!out.keys.exists { case (s, p) => s != "ALL" && p == "ALL" })
    // detail rows sum to their priority margin
    out.collect { case (("ALL", p), n) if p != "ALL" =>
      assert(out.collect { case ((s, q), m) if q == p && s != "ALL" => m }.sum == n)
    }
  }

  test("aggMerge: merged daily partials equal the direct weekly aggregate (IVM property)") {
    val t = Tables(spark, TestSpark.sf0001)
    val merged = AnalyticsQueries.aggMerge(t).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    // direct weekly aggregation over raw events — no daily intermediate
    val direct = t.events.filter($"event_type" === "purchase")
      .groupBy($"user_id", date_trunc("week", to_date($"ts")).cast("date").as("week"))
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (k, (n, total, avg)) =>
      assert(direct(k) == ((n, total)), s"partial-merge drift at $k")
      // EXACT decimal reference: cents / (100·n) at scale 4 HALF_UP —
      // a double-quotient reference would itself sit on the wrong side
      // of a …5 tie (the r10 q_agg_merge cross-engine bug)
      val cents = java.math.BigDecimal.valueOf(math.round(total * 100))
      val r4 = cents
        .divide(java.math.BigDecimal.valueOf(100L * n), 4, java.math.RoundingMode.HALF_UP)
        .doubleValue() + 0.0
      assert(avg == r4, s"avg at $k: got $avg expected $r4")
    }
    // planted TIE: 282.59 over 8 purchases = 35.32375 exactly — must
    // round HALF-UP to 35.3238 (the double-rounding path said .3237)
    val tie = Seq(
      (7L, java.sql.Date.valueOf("2024-01-03"), 5L, BigDecimal("200.00")),
      (7L, java.sql.Date.valueOf("2024-01-04"), 3L, BigDecimal("82.59")))
      .toDF("user_id", "day", "n", "total")
    val tieOut = AnalyticsQueries.weeklyFromDaily(tie).collect()
    assert(tieOut.length == 1)
    assert(tieOut(0).getAs[Double]("avg_value") == 35.3238,
      s"decimal tie must round half-up, got ${tieOut(0).getAs[Double]("avg_value")}")
  }

  test("skewReport: JVM differential — top-5 hottest keys, exact shares and hotness") {
    val t = Tables(spark, TestSpark.sf0001)
    val counts = t.events.groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    val nKeys = counts.length.toLong
    def r4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    val expect = counts.sortBy { case (id, n) => (-n, id) }.take(5).map { case (id, n) =>
      (id, n, r4(n.toDouble / total), r4(n.toDouble * nKeys / total))
    }.toSeq
    val got = AnalyticsQueries.skewReport(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expect)
  }

  test("giniReport: uniform values → 0, one-carries-all → (n−1)/n; JVM differential per priority") {
    import spark.implicits._
    val hand = Seq(
      (1L, "E", 10.0), (2L, "E", 10.0), (3L, "E", 10.0), (4L, "E", 10.0),
      (5L, "U", 0.01), (6L, "U", 0.01), (7L, "U", 0.01), (8L, "U", 400.0)
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = AnalyticsQueries.giniReport(hand).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got("E") == ((4L, 0.0)), "perfectly even → Gini 0")
    // near-maximal: G = 2·(1·.01+2·.01+3·.01+4·400)/(4·400.03) − 5/4 ≈ 0.7499
    assert(math.abs(got("U")._2 - 0.7499) < 1e-4, s"got ${got("U")._2}")
    // JVM differential on real orders
    val rows = t.orders.select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP), r.getLong(2)))
    val real = AnalyticsQueries.giniReport(t.orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (prio, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3)).zipWithIndex
      val n = xs.length
      val s0 = xs.map(_._2).sum
      val s1 = sorted.map { case ((_, x, _), i) => BigDecimal(i + 1) * x }.sum
      val g = (2.0 * s1.toDouble) / (n * s0.toDouble) - (n + 1).toDouble / n
      val (gn, grev, ggini) = real(prio)
      assert(gn == n && math.abs(grev - s0.toDouble) < 1e-6)
      assert(math.abs(ggini - BigDecimal(g).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(ggini >= 0.0 && ggini < 1.0)
    }
  }

  test("basketLift: hand baskets — lift separates affinity from popularity; JVM differential on real lineitem") {
    import spark.implicits._
    // parts 1,2 co-occur in ALL their orders (affinity, lift high);
    // part 9 is popular but independent of 1 (lift ≈ 1)
    val hand = Seq(
      (100L, 1L), (100L, 2L), (100L, 9L),
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 2L), (102L, 9L),
      (103L, 9L), (104L, 9L), (105L, 9L), (106L, 7L)
    ).toDF("l_orderkey", "l_partkey")
    val got = AnalyticsQueries.basketLift(hand, minPairCount = 2L, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // N=7 orders; c1=3, c2=3, c9=5; n12=3 → lift 7·3/9 = 2.3333; n19=2 → 7·2/15 = 0.9333
    assert(got((1L, 2L)) == ((3L, 0.428571, 2.3333)))
    assert(got((1L, 9L))._3 == 0.9333, "popular-but-independent pair sits at lift ≈ 1")
    // JVM differential on the real table: recompute the full top-20
    val op = t.lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val n = op.map(_._1).distinct.length.toLong
    val pc = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nab = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 3L)
    val expect = nab.map { case ((a, b), c) =>
      (a, b, c, c.toDouble * n / (pc(a) * pc(b)))
    }.toSeq.sortBy { case (a, b, _, l) => (-l, a, b) }.take(20)
    val real = AnalyticsQueries.basketLift(t.lineitem).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(real.map(x => (x._1, x._2, x._3)).toSeq == expect.map(x => (x._1, x._2, x._3)),
      "top-20 selection must match the JVM reference")
    real.zip(expect).foreach { case ((_, _, _, gl), (_, _, _, el)) =>
      assert(math.abs(gl - BigDecimal(el).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("eventFunnel: ordering constraint enforced (purchase before first view does not convert); JVM differential") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val hand = Seq(
      // u1: ordered view→click→purchase → reaches all 3
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: purchase BEFORE the first view → stops at click
      (2L, "purchase", ts("2024-01-02 09:00:00")), (2L, "view", ts("2024-01-02 10:00:00")),
      (2L, "click", ts("2024-01-02 11:00:00")),
      // u3: view only
      (3L, "view", ts("2024-01-03 10:00:00")),
      // u4: click without any view → reaches nothing (step 1 missing)
      (4L, "click", ts("2024-01-04 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = AnalyticsQueries.eventFunnel(hand).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1) == (("view", 3L, 1.0)))
    assert(got(2) == (("click", 2L, 0.6667)))
    assert(got(3) == (("purchase", 1L, 0.3333)), "u2's early purchase must not convert")
    // JVM differential on real events
    val rows = t.events.filter(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = rows.groupBy(_._1).view.mapValues { xs =>
      def first(s: String) = xs.filter(_._2 == s).map(_._3).minOption
      (first("view"), first("click"), first("purchase"))
    }.toMap
    val n0 = byUser.values.count(_._1.isDefined).toLong
    val n1 = byUser.values.count(v => v._1.isDefined && v._2.isDefined && v._1.get <= v._2.get).toLong
    val n2 = byUser.values.count(v => v._1.isDefined && v._2.isDefined && v._1.get <= v._2.get
      && v._3.isDefined && v._2.get <= v._3.get).toLong
    val real = AnalyticsQueries.eventFunnel(t.events).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(real(1) == n0 && real(2) == n1 && real(3) == n2)
    assert(n0 >= n1 && n1 >= n2, "funnel must be monotone")
  }

  test("stickiness: hand stream exact; WAU equals brute-force 7-day distinct on real events") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val hand = Seq(
      (1L, ts("2024-01-01")), (2L, ts("2024-01-01")),
      (1L, ts("2024-01-03")),
      (3L, ts("2024-01-08"))
    ).toDF("user_id", "ts")
    val got = AnalyticsQueries.stickiness(hand).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // day 1: dau {1,2}, wau [dec26..jan1] = {1,2} → 1.0
    assert(got("2024-01-01") == ((2L, 2L, 1.0)))
    // day 3: dau {1}, wau [dec28..jan3] = {1,2} → 0.5
    assert(got("2024-01-03") == ((1L, 2L, 0.5)))
    // day 8: dau {3}, wau [jan2..jan8] = {1,3} → 0.5 (jan-1 users aged out)
    assert(got("2024-01-08") == ((1L, 2L, 0.5)))
    assert(got.size == 3, "only days with activity are reported")
    // real events: WAU at each reported day equals the brute-force
    // distinct over the trailing 7 days
    val ud = t.events.select(col("user_id"), col("ts").cast("date")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    AnalyticsQueries.stickiness(t.events).collect().foreach { r =>
      val d = r.getDate(0).toLocalDate
      val brute = ud.filter { case (_, ud_) =>
        !ud_.isAfter(d) && !ud_.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
      assert(r.getLong(2) == brute, s"day $d WAU")
      assert(r.getLong(1) <= r.getLong(2), "DAU <= WAU")
    }
  }

  test("cumeUsers: hand stream — new/active/cumulative agree; cumulative equals distinct-so-far everywhere") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")
    // week starts (Mon): 2024-01-01, 01-08, 01-15
    val hand = Seq(
      (1L, ts("2024-01-02")), (2L, ts("2024-01-03")), (1L, ts("2024-01-04")), // wk1: u1,u2 new
      (1L, ts("2024-01-09")),                                                  // wk2: u1 returns
      (3L, ts("2024-01-16")), (1L, ts("2024-01-17"))                           // wk3: u3 new, u1 active
    ).toDF("user_id", "ts")
    val got = AnalyticsQueries.cumeUsers(hand).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 2L)))
    assert(got("2024-01-08") == ((1L, 0L, 2L)), "returning-only week adds no new users")
    assert(got("2024-01-15") == ((2L, 1L, 3L)))
    // real events: n_cume at each week equals the brute-force distinct
    // count of users first seen up to that week
    val uw = t.events.select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct().collect().map(r => (r.getLong(0), r.getDate(1).toString))
    val real = AnalyticsQueries.cumeUsers(t.events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    real.foreach { case (wk, nActive, _, nCume) =>
      assert(nActive == uw.filter(_._2 == wk).map(_._1).distinct.length.toLong)
      assert(nCume == uw.filter(_._2 <= wk).map(_._1).distinct.length.toLong, s"week $wk")
    }
    assert(real.map(_._4).toSeq == real.map(_._4).sorted.toSeq, "cumulative curve is monotone")
  }

  test("yoyRevenue: hand calendar — growth vs 12-months-back by KEY; a gap month yields NULL, not the 12th present row") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val hand = Seq(
      (1L, ts("2020-01-05"), 60.0), (2L, ts("2020-01-20"), 40.0), // 2020-01: 100
      (3L, ts("2020-02-10"), 200.0),                              // 2020-02: 200
      (4L, ts("2021-01-07"), 150.0),                              // 2021-01: 150 → +50%
      (5L, ts("2021-03-01"), 50.0)                                // 2021-03: prev missing → NULL
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = AnalyticsQueries.yoyRevenue(hand).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    assert(got("2020-01-01") == ((2L, 100.0, None)))
    assert(got("2021-01-01") == ((1L, 150.0, Some(0.5))))
    assert(got("2021-03-01") == ((1L, 50.0, None)), "gap month must NOT compare against the 12th present row")
    // JVM differential on the real table
    val months = t.orders.select(date_trunc("month", col("o_orderdate")).cast("date"),
        col("o_totalprice")).collect()
      .map(r => (r.getDate(0).toString, BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val real = AnalyticsQueries.yoyRevenue(t.orders).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getDouble(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    assert(real.size == months.size)
    months.foreach { case (m, (n, rev)) =>
      val prevKey = f"${m.substring(0, 4).toInt - 1}%04d${m.substring(4)}"
      val (gn, grev, gyoy) = real(m)
      assert(gn == n && math.abs(grev - rev.toDouble) < 1e-6)
      months.get(prevKey) match {
        case Some((_, prev)) if prev != 0 =>
          val exp = BigDecimal((rev - prev).toDouble / prev.toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(gyoy.isDefined && math.abs(gyoy.get - exp) < 1e-9, s"month $m")
        case _ => assert(gyoy.isEmpty, s"month $m should have no prior year")
      }
    }
  }

  test("robustStats: hand groups — lower median, MAD, Hampel outliers; JVM differential on real data") {
    import spark.implicits._
    val hand = Seq(
      // A: med = 2 (rank 3 of 5), absdev sorted [0,1,1,2,98] → mad = 1,
      // outliers |x−2| > 3 → only 100
      (1L, "A", 0.0), (2L, "A", 1.0), (3L, "A", 2.0), (4L, "A", 3.0), (5L, "A", 100.0),
      // B (even n): lower median = 0, mad = 0, outliers absdev > 0 → the 10
      (6L, "B", 0.0), (7L, "B", 10.0)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val got = AnalyticsQueries.robustStats(hand).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got("A") == ((5L, 2.0, 1.0, 1L)))
    assert(got("B") == ((2L, 0.0, 0.0, 1L)))
    // JVM differential on the real table
    val rows = t.customer.select("c_mktsegment", "c_acctbal", "c_custkey").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val real = AnalyticsQueries.robustStats(t.customer).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    rows.groupBy(_._1).foreach { case (seg, xs) =>
      val n = xs.length
      val med = xs.sortBy(x => (x._2, x._3)).apply((n + 1) / 2 - 1)._2
      val devs = xs.map(x => (math.abs(x._2 - med), x._3))
      val mad = devs.sortBy(identity).apply((n + 1) / 2 - 1)._1
      val outliers = devs.count(_._1 > 3.0 * mad).toLong
      assert(real(seg) == ((n.toLong, med, mad, outliers)), s"segment $seg")
    }
  }
}
