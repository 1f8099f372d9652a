package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Skew
import graft.queries.AnalyticsQueries

/** Scale-mitigation operators: salting, sketch aggregates, bucketed
  * co-located joins. Each check proves the mitigated plan produces the
  * SAME result as the straightforward plan (that equivalence is the
  * whole point — these are drop-in replacements under skew/scale). */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Tables(spark, TestSpark.sf0001)

  test("saltedJoin: row-identical to the plain join under a hot key") {
    // fabricate skew: all lineitems of one suppkey (a hot dim key)
    val fact = t.lineitem.select($"l_orderkey", $"l_linenumber", $"l_suppkey")
    val dim = t.supplier.select($"s_suppkey".as("l_suppkey"), $"s_name")
    val plain = fact.join(dim, "l_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_name")
    val salted = Skew.saltedJoin(fact, dim, key = "l_suppkey",
      factUnique = "l_orderkey", salts = 8)
      .select($"l_orderkey", $"l_linenumber", $"s_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedCount/saltedSum: identical to direct aggregation") {
    val direct = t.orders.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(t.orders, "o_orderstatus", "o_orderkey", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)

    val directSum = t.orders.groupBy($"o_orderstatus")
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("s")).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val saltedSum = Skew.saltedSum(t.orders, "o_orderstatus", "o_orderkey",
      $"o_totalprice".cast("decimal(18,2)"), 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(saltedSum == directSum)
  }

  test("distinctAggApprox: within 2% of exact counts; plan avoids the Expand blow-up") {
    val exact = AnalyticsQueries.distinctAgg(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = AnalyticsQueries.distinctAggApprox(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.02, s"$k: $n vs ${approx(k)}")
    }
    // the q_profile_hll plan-contrast convention: multi-column exact
    // distinct plans an Expand (map output × #distinct-columns); the
    // sketch mode must not
    val exactDf = AnalyticsQueries.distinctAgg(t); exactDf.collect()
    val approxDf = AnalyticsQueries.distinctAggApprox(t); approxDf.collect()
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Expand")
    assert(hasExpand(exactDf), "exact multi-distinct should plan an Expand")
    assert(!hasExpand(approxDf), "HLL mode must be Expand-free")
  }

  test("check twins: exact columns equal the exact keys; every within_2pct flag is 1; flags CAN fail") {
    // q_distinct_agg_approx_check: exact side identical to q_distinct_agg,
    // flags all 1 (the sketch sat inside the bound on the oracle corpus)
    val chk = AnalyticsQueries.distinctAggCheck(t).collect()
      .map(r => r.getString(0) -> r).toMap
    AnalyticsQueries.distinctAgg(t).collect().foreach { r =>
      val c = chk(r.getString(0))
      assert(c.getAs[Long]("nd_parts") == r.getAs[Long]("nd_parts"))
      assert(c.getAs[Long]("nd_supps") == r.getAs[Long]("nd_supps"))
      assert(c.getAs[Long]("nd_orders") == r.getAs[Long]("nd_orders"))
      assert(c.getAs[Long]("n") == r.getAs[Long]("n"))
      assert(c.getAs[Long]("parts_within_2pct") == 1L &&
        c.getAs[Long]("supps_within_2pct") == 1L &&
        c.getAs[Long]("orders_within_2pct") == 1L)
    }
    // q_profile_hll_check: same shape on the profile side
    val pchk = graft.ops.Profiler.profileCheck(t.orders).collect()
      .map(r => r.getString(0) -> r).toMap
    graft.ops.Profiler.profile(t.orders, exact = true).collect().foreach { r =>
      val c = pchk(r.getString(0))
      assert(c.getAs[Long]("n_distinct") == r.getAs[Long]("n_distinct"))
      assert(c.getAs[Long]("n_null") == r.getAs[Long]("n_null"))
      assert(c.getAs[Long]("nd_within_2pct") == 1L)
    }
    // the flag is a LIVE comparison, not a constant: an unsatisfiable
    // tolerance (negative — |δ| ≤ −e is false for every e > 0, even at
    // δ = 0) must flip EVERY flag to 0 deterministically
    val strict = AnalyticsQueries.distinctAggCheck(t, tol = -1.0).collect()
    strict.foreach { r =>
      assert(r.getAs[Long]("parts_within_2pct") == 0L &&
        r.getAs[Long]("supps_within_2pct") == 0L &&
        r.getAs[Long]("orders_within_2pct") == 0L,
        "negative tol must fail every live flag")
    }
  }

  test("profiler: one pass, correct nulls/distincts, sketch within 2% of exact") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (4L, Some("a")))
      .toDF("id", "s")
    val p = graft.ops.Profiler.profile(df, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("s").getAs[Long]("n_null") == 1 && p("s").getAs[Long]("n_distinct") == 2)
    assert(p("id").getAs[Long]("n_null") == 0 && p("id").getAs[Long]("n_distinct") == 4)
    assert(p("id").getAs[Long]("n_rows") == 4)
    // sketch mode stays close on a real table
    val exact = graft.ops.Profiler.profile(t.lineitem, exact = true).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val hll = graft.ops.Profiler.profile(t.lineitem, exact = false)
    hll.collect().foreach { r =>
      val e = exact(r.getString(0))
      if (e > 100) assert(math.abs(r.getAs[Long]("n_distinct") - e).toDouble / e < 0.02)
    }
    // plan shape: the HLL mode must stay a single Expand-free pass
    // (a multi-column countDistinct would plan an Expand that
    // multiplies every input row by #distinct-columns — the thing the
    // sketch mode exists to avoid at 100 TB); small columns stay exact
    // on the sketch too
    assert(!hll.queryExecution.executedPlan.toString.contains("Expand"),
      "HLL profile must not plan an Expand")
    // r16 opt: the EXACT mode is Expand-free too — per-column two-stage
    // hash aggregates assembled by 1-row crossJoins replaced the
    // multi-distinct rewrite (Expand ×(#cols+1) + two corpus-wide
    // SortAggregates); this pins the new shape
    val exactPlan = graft.ops.Profiler.profile(t.lineitem, exact = true)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"),
      "exact profile must not plan an Expand (per-column assembly)")
    // (the null/min/max pass is a KEYLESS SortAggregate — string min/max
    // buffers are immutable so hash-agg can't host them, and a no-key
    // sort aggregate performs no sort; the thing to keep out is the
    // Expand and the keyed corpus-wide sorts it forced)
    assert(!exactPlan.contains("Sort ["),
      "exact profile must not plan a corpus sort")
    hll.collect().foreach { r =>
      val e = exact(r.getString(0))
      if (e <= 100) assert(r.getAs[Long]("n_distinct") == e,
        s"${r.getString(0)}: tiny cardinalities are exact under HLL++")
    }
  }

  test("exact profile: per-column distinct branches scan ONLY their column (ReadSchema)") {
    // VERDICT r16 #8: the per-column assembly plans N single-column
    // scans — the "same total bytes as one wide scan" claim holds only
    // if parquet column pruning reaches each branch's scan. Pin it via
    // the ReadSchema lines of the executed formatted plan: one wide
    // base pass (null/min/max over all columns) + exactly one
    // single-column scan per column.
    val df = graft.ops.Profiler.profile(t.orders, exact = true)
    df.collect() // AQE: execute before reading the final plan
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(txt).map(_.group(1)).toSeq
    val nCols = t.orders.columns.length
    val single = schemas.count(s => !s.contains(","))
    val wide = schemas.count(s => s.split(",").length == nCols)
    assert(single == nCols,
      s"expected $nCols single-column pruned scans, got $single in: $schemas")
    assert(wide == 1, s"expected one wide base-pass scan, got $wide in: $schemas")
  }

  test("date-partitioned writes prune partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables(spark, TestSpark.sf0001).events
      .withColumn("event_date", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val q = spark.read.parquet(dir).filter($"event_date" === "2024-01-05")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"), scan)
    // the layout really has ~30 date partitions, and the filtered read
    // returns exactly the one day's events
    assert(spark.read.parquet(dir).select("event_date").distinct().count() > 20)
    assert(q.count() == Tables(spark, TestSpark.sf0001).events.filter(to_date($"ts") === "2024-01-05").count())
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously interrupted run can leave the managed location behind
    for (t <- Seq("b_orders", "b_lineitem")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    t.lineitem.select($"l_orderkey", $"l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // disable broadcast so the test exercises the big-big (bucketed) path
    // that matters at 100 TB, where neither side fits in memory
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity"))
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // co-located: the join itself needs no Exchange (only the final agg may)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("SortMergeJoin") || finalPlan.contains("ShuffledHashJoin"), plan)
    val exchangesBelowJoin = finalPlan.linesIterator
      .dropWhile(l => !l.contains("Join")).count(_.contains("Exchange"))
    assert(exchangesBelowJoin == 0,
      s"expected bucket-co-located join with no exchange below the join:\n$plan")
    assert(finalPlan.contains("Bucketed: true"), plan)
  }
}
