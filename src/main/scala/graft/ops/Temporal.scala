package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic temporal operators: as-of join and sessionization, usable on
  * any DataFrame (the `q_asof_join` / `q_sessionize` keys are these,
  * applied to the events table).
  *
  * Both are single-shuffle designs: tag/union (for as-of) or plain
  * window (for sessionize), then per-key window functions with bounded
  * state. The naive alternatives — a range join `r.ts <= l.ts` for
  * as-of, or a self-join for sessionization — explode to
  * O(left × right) per key and do not survive 100 TB.
  */
object Temporal {

  /** As-of join: for each left row, attach the latest right row with
    * `right.rightTs <= left.leftTs` for the same `on` key (ties on the
    * timestamp resolved toward the largest `rightTieBreak`). Left rows
    * with no matching right row are kept with nulls.
    *
    * Output: all left columns, plus each `rightPayload` column as
    * `asof_<name>`.
    *
    * Implementation: union both sides (right rows sort before left rows
    * at equal timestamps), one window per key ordered by (ts, side,
    * tie), `last(payload_struct, ignoreNulls)` — ONE shuffle on the key,
    * window state bounded by one payload struct. */
  def asof(left: DataFrame, right: DataFrame, on: String,
           leftTs: String, rightTs: String,
           rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    val reserved = Seq("__ts", "__side", "__tie", "__payload", "__match")
    require(!left.columns.exists(reserved.contains),
      s"left frame must not contain the reserved columns ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(on),
      col(rightTs).as("__ts"),
      col(rightTieBreak).as("__tie"),
      struct(rightPayload.map(col): _*).as("__payload"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(on))
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col(s"__match.`$p`").as(s"asof_$p")): _*)
  }

  /** Proximity (banded θ) self-join: all ordered pairs of rows sharing
    * `key` with `0 < t(b) − t(a) ≤ window`. The naive form is an
    * inequality self-join — O(rows²) per key, a cartesian in disguise.
    * This plans it as an EQUI-join on (key, time-bucket): with bucket
    * width = the window, any qualifying pair lands in the same or
    * adjacent bucket, so the left side probes buckets {b, b+1} (a 2×
    * fan-out of key/ts/id columns only) and the band predicate filters
    * the equi-matches. Shuffle is keyed by (key, bucket) — work scales
    * with genuine temporal co-location, never with per-key row count
    * squared. The same trick generalizes to any banded condition
    * (|x−y| ≤ w on any orderable column). */
  def proximityJoin(df: DataFrame, key: String, ts: String, id: String,
                    windowMinutes: Int): DataFrame = {
    require(!df.columns.contains("__bk"),
      "frame must not contain the reserved column __bk")
    val wUs = windowMinutes.toLong * 60L * 1000000L
    def bucket(c: String): org.apache.spark.sql.Column =
      floor(unix_micros(col(c)) / wUs)
    val aSide = df.select(col(key), col(ts).as("a_ts"), col(id).as("a_id"))
      .withColumn("__bk", explode(array(bucket("a_ts"), bucket("a_ts") + 1)))
    val bSide = df.select(col(key), col(ts).as("b_ts"), col(id).as("b_id"))
      .withColumn("__bk", bucket("b_ts"))
    aSide.join(bSide, Seq(key, "__bk"))
      .filter(col("b_ts") > col("a_ts") &&
        unix_micros(col("b_ts")) - unix_micros(col("a_ts")) <= wUs)
      .select(col(key), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("delta_us"))
  }

  /** Sessionization: assign a per-key session id that increments whenever
    * the gap to the previous row (ordered by `ts`, `tieBreak`) exceeds
    * `gapMinutes`. Output: input columns + `session_id` (1-based per
    * key). ONE shuffle on the key; both window functions reuse it. */
  def sessionize(df: DataFrame, key: String, ts: String, tieBreak: String,
                 gapMinutes: Int): DataFrame = {
    require(!df.columns.exists(Seq("__gap_us", "__new_sess").contains),
      "frame must not contain the reserved columns __gap_us, __new_sess")
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tieBreak).asc)
    val gapUs = lit(gapMinutes.toLong * 60L * 1000000L)
    df.withColumn("__gap_us",
        unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("__new_sess",
        when(col("__gap_us").isNull || col("__gap_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__gap_us", "__new_sess")
  }
}
