package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Schema-dynamic data profiling: per-column null counts, distinct
  * counts, and min/max — the first thing a pipeline runs against an
  * unknown 100 TB table.
  *
  * ONE pass over the data: all per-column aggregates go into a single
  * `agg(...)` (one job, map-side partials), then the wide single row is
  * unpivoted to one row per column with a `stack` projection — no
  * per-column jobs, no collect of data rows.
  *
  * `exact = false` (the at-scale default) uses HyperLogLog++ distinct
  * sketches; `exact = true` plans Expand-based exact distincts (used by
  * the oracle-checked `q_profile` key at test scale).
  */
object Profiler {

  /** Input contract (ADVICE r16): `exact = true` evaluates `df` once
    * per column plus one base pass — the "same total bytes" argument
    * relies on parquet COLUMN PRUNING, so point exact mode at a (near-)
    * direct file scan (the driver keys profile a base table). Profiling
    * a derived/computed frame in exact mode recomputes its upstream
    * pipeline once per column — cache such a frame first, or use the
    * sketch mode, whose single pass has no such amplification. */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    // r16 opt: the exact mode no longer plans the multi-countDistinct
    // rewrite. One agg(countDistinct(a), countDistinct(b), …) goes
    // through Expand ×(#cols+1) — every input row replicated per
    // distinct column — then (min/max string buffers being immutable)
    // TWO full SortAggregates over the expanded width with a
    // full-width Exchange between them: at 100 TB that is a 7× row
    // blow-up, two corpus sorts and a corpus-wide shuffle for what is
    // per-column metadata. Instead: one Expand-free hash pass for
    // null/min/max/total + one two-stage hash aggregate PER COLUMN for
    // its exact distinct count (each a single-column scan — parquet
    // column pruning makes the N scans read the same total bytes as
    // the one wide scan), assembled by 1-row-frame crossJoins (the
    // t_bm25 corpus-stats broadcast shape; never a data-side join).
    // Plan diff at sf0.1: Expand+2×SortAggregate+2 Exchanges →
    // 7 independent hash-agg subplans, no Sort anywhere.
    val baseAggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__total")
    val wide =
      if (!exact) {
        // at-scale mode: distinct sketches merge map-side in the SAME
        // single pass as null/min/max — one scan, no Expand. r16 opt:
        // the sketch is DataSketches HLL (lgK=14, rel err measured
        // ≤ 0.6% on this corpus vs the 2% declared bound) instead of
        // HLL++ at rsd 0.01 — the HLL++ buffer at that precision is
        // ~1 638 longs PER SKETCH exposed as separate aggregate
        // attributes (the executed plan carried 9 853 buffer
        // attributes), which made the sketch pass ~10× slower than the
        // one-binary-buffer DataSketches aggregate (measured 3.8 s vs
        // 0.35 s on the bench corpus). Same declared contract: an
        // engine-side sketch bounded by the 2% SpecBound, re-certified
        // every round by Verify and by the hash-green *_check twin.
        val aggs = cols.flatMap { c =>
          Seq(
            count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
            sketchDistinct(df, c).as(s"__nd_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        } :+ count(lit(1)).as("__total")
        df.agg(aggs.head, aggs.tail: _*)
      } else {
        val base = df.agg(baseAggs.head, baseAggs.tail: _*)
        cols.foldLeft(base) { (acc, c) =>
          acc.crossJoin(
            df.select(col(c)).agg(countDistinct(col(c)).as(s"__nd_$c")))
        }
      }
    val stackArgs = cols.map { c =>
      s"'$c', `__null_$c`, `__nd_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.select(col("__total").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** The in-plan sketch-accuracy CHECK for [[profile]]'s HLL mode — the
    * hash-checkable twin of `q_profile_hll` (whose raw estimates have no
    * DuckDB replay by construction): TWO separate passes — the exact
    * multi-distinct profile and an HLL-only sketch pass — joined on the
    * ≤ #columns-row unpivots (see the Plan-cost paragraph below for why
    * a combined aggregate is pathological), and the output
    * carries the exact profile plus `nd_within_2pct` = 1 iff
    * |hll − exact| ≤ tol·exact. The DuckDB oracle recomputes the exact
    * profile and emits the literal 1 (exact-vs-exact is trivially within
    * any tol), so a hash MATCH is a positive machine check that every
    * column's sketch sat inside the declared bound — the driver-visible
    * form of the spec bound Verify already prints.
    *
    * Plan cost: TWO clean single-row aggregates (the exact [[profile]]
    * pass and an HLL-only pass) joined on the ≤ #columns-row unpivots —
    * deliberately NOT one combined aggregate: mixing the multi-column
    * `countDistinct` rewrite (Expand ×(#cols+1)) with the HLL
    * ImperativeAggregate buffers forces the whole expanded input
    * through a single sort-based aggregate with per-row sketch buffer
    * (de)serialization — measured minutes at 150k rows vs ~3 s for the
    * two separate hash-planned passes. Two scans beat one pathological
    * aggregate at every scale. */
  /** The DataSketches-HLL distinct-count estimate for one column
    * (r16 opt — see [[profile]]'s sketch-mode note): lgK=14 ⇒ rse
    * ≈ 0.8%, well inside the 2% SpecBound. `hll_sketch_agg` accepts
    * only INT/BIGINT/STRING/BINARY, so other types go through a
    * STRING cast — injective for this corpus's types (timestamps keep
    * microseconds, doubles their shortest-repr), and the value is an
    * ESTIMATE under a declared tolerance either way. NULLs are skipped
    * by the aggregate exactly like approx_count_distinct; the coalesce
    * keeps the all-null/empty edge at 0 like the old sketch. */
  private def sketchDistinct(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    val in = df.schema(c).dataType match {
      case LongType | IntegerType | StringType | BinaryType => col(c)
      // normalize negative zero before the string cast (ADVICE r16):
      // countDistinct treats 0.0 and -0.0 as one value, but their
      // string forms differ — `+ 0.0` maps -0.0 to 0.0 (IEEE) and
      // changes no other value, keeping the cast injective
      case DoubleType | FloatType => (col(c) + lit(0.0)).cast("string")
      case _ => col(c).cast("string")
    }
    coalesce(hll_sketch_estimate(hll_sketch_agg(in, lit(14))), lit(0L))
  }

  def profileCheck(df: DataFrame, tol: Double = 0.02): DataFrame = {
    val cols = df.columns.toSeq
    val hllAggs = cols.map(c => sketchDistinct(df, c).as(s"__hll_$c"))
    val hllStack = cols.map(c => s"'$c', `__hll_$c`").mkString(", ")
    val hll = df.agg(hllAggs.head, hllAggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $hllStack) AS (column_name, hll_nd)"))
    profile(df, exact = true)
      .join(broadcast(hll), Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        (abs(col("hll_nd") - col("n_distinct")).cast("double") <=
          lit(tol) * col("n_distinct").cast("double")).cast("long").as("nd_within_2pct"),
        col("min_value"), col("max_value"))
  }

  // ---- driver wiring ----

  /** q_profile_hll is the AT-SCALE mode of the same profile: HLL++
    * distinct sketches (rsd 0.01) replace the Expand-based exact
    * multi-distinct, so the single pass stays Expand-free (one row per
    * input row per aggregate, not per distinct column — spec-asserted)
    * and sketch partials merge map-side. Rows-only by declared design
    * (HLL++ bucket estimates are engine-specific); the differential
    * spec bounds every column's estimate against the exact mode. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> ((s, d) => profile(Tables(s, d).orders, exact = true)),
    "q_profile_hll" -> ((s, d) => profile(Tables(s, d).orders, exact = false)),
    "q_profile_hll_check" -> ((s, d) => profileCheck(Tables(s, d).orders)))

  private val baseOracles: Map[String, String] = Map(
    "q_profile" ->
      """WITH t AS (SELECT COUNT(*) AS n_rows FROM orders)
        |SELECT 'o_orderkey' AS column_name, n_rows,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS n_null,
        |  (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_distinct,
        |  (SELECT CAST(MIN(o_orderkey) AS VARCHAR) FROM orders) AS min_value,
        |  (SELECT CAST(MAX(o_orderkey) AS VARCHAR) FROM orders) AS max_value FROM t
        |UNION ALL SELECT 'o_custkey', n_rows,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
        |  (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        |  (SELECT CAST(MIN(o_custkey) AS VARCHAR) FROM orders),
        |  (SELECT CAST(MAX(o_custkey) AS VARCHAR) FROM orders) FROM t
        |UNION ALL SELECT 'o_orderstatus', n_rows,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NULL),
        |  (SELECT COUNT(DISTINCT o_orderstatus) FROM orders),
        |  (SELECT MIN(o_orderstatus) FROM orders),
        |  (SELECT MAX(o_orderstatus) FROM orders) FROM t
        |UNION ALL SELECT 'o_totalprice', n_rows,
        |  (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL),
        |  (SELECT COUNT(DISTINCT o_totalprice) FROM orders),
        |  (SELECT CAST(MIN(o_totalprice) AS VARCHAR) FROM orders),
        |  (SELECT CAST(MAX(o_totalprice) AS VARCHAR) FROM orders) FROM t
        |UNION ALL SELECT 'o_orderdate', n_rows,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
        |  (SELECT COUNT(DISTINCT o_orderdate) FROM orders),
        |  (SELECT strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders),
        |  (SELECT strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders) FROM t
        |UNION ALL SELECT 'o_orderpriority', n_rows,
        |  (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL),
        |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders),
        |  (SELECT MIN(o_orderpriority) FROM orders),
        |  (SELECT MAX(o_orderpriority) FROM orders) FROM t""".stripMargin)

  /** The check twin's oracle DERIVES from q_profile's: the exact profile
    * wrapped with the literal pass flag (exact-vs-exact is within any
    * tolerance by definition) — so the Spark side's computed
    * `nd_within_2pct` hash-matches iff every column's HLL estimate sat
    * inside the bound. Derived from the same SQL string so the two
    * oracles can never drift apart. */
  val oracles: Map[String, String] = baseOracles +
    ("q_profile_hll_check" ->
      s"""SELECT column_name, n_rows, n_null, n_distinct,
         |  CAST(1 AS BIGINT) AS nd_within_2pct, min_value, max_value
         |FROM (
         |${baseOracles("q_profile")}
         |) p""".stripMargin)
}
