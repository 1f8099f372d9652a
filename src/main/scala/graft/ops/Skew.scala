package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY §5: "for skewed doc dedup, salt =
  * hash prefix").
  *
  * AQE's skew-join handles most runtime skew by splitting oversized
  * partitions, but two cases still need explicit salting at 100 TB:
  * a single hot KEY inside one partition (AQE can split a partition,
  * not a key), and skewed aggregation (AQE does not salt aggregates).
  * Both helpers are deterministic — the salt derives from a hash of an
  * existing unique column, never from rand() — so results are stable
  * and replayable.
  */
object Skew {

  /** Salted fact⋈dim equi-join for a skewed fact key: the fact side gets
    * a deterministic salt in [0, salts) from `factUnique` (any unique or
    * near-unique column); the dim side is replicated `salts` times. The
    * join key becomes (key, salt), so a hot key's rows spread over
    * `salts` reducers instead of one. Result is row-identical to the
    * unsalted join.
    *
    * Use when one fact key holds ≫ one reducer's share (e.g. the empty
    * document's fingerprint, a null-ish user id). Replication cost:
    * `salts ×` the dim side — keep the dim small or pre-filtered. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factUnique: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "frames must not contain the reserved column __salt")
    val saltedFact = fact.withColumn("__salt", pmod(hash(col(factUnique)), lit(salts)))
    val saltedDim = dim.withColumn("__salt", explode(lit((0 until salts).toArray)))
    saltedFact.join(saltedDim,
        saltedFact("__salt") === saltedDim("__salt") &&
        saltedFact(key) === saltedDim(key))
      .drop("__salt")
      .drop(saltedDim(key))
  }

  /** Two-phase salted aggregation for skewed group keys: partial
    * aggregate on (key, salt), then merge on key. Works for any
    * agg whose partial and merge are both expressible (count/sum here —
    * the common hot-key cases). A hot key's input spreads over `salts`
    * partial groups before the tiny merge. */
  def saltedCount(df: DataFrame, key: String, unique: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!df.columns.contains("__salt"), "frame must not contain the reserved column __salt")
    df.withColumn("__salt", pmod(hash(col(unique)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
  }

  /** Salted sum variant (exact decimal path left to the caller's cast). */
  def saltedSum(df: DataFrame, key: String, unique: String, valueCol: Column,
                salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!df.columns.exists(Seq("__salt", "__v").contains),
      "frame must not contain the reserved columns __salt, __v")
    df.withColumn("__salt", pmod(hash(col(unique)), lit(salts)))
      .withColumn("__v", valueCol)
      .groupBy(col(key), col("__salt"))
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"))
  }

  // ---- driver wiring ----

  import org.apache.spark.sql.SparkSession
  import graft.core.Tables

  /** Oracle keys proving the salted plans are RESULT-IDENTICAL to their
    * unsalted equivalents — the property deterministic salting exists
    * for. DuckDB runs the plain aggregate/join; Spark runs the salted
    * two-phase plan (l_returnflag / c_mktsegment are the archetypal
    * few-hot-groups keys these guards target at 100 TB). Sums stay in
    * DECIMAL(18,2) through both phases, so salting cannot perturb a
    * single bit of the result. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_agg" -> ((s, d) =>
      saltedSum(Tables(s, d).lineitem, "l_returnflag", "l_orderkey",
          col("l_extendedprice").cast("decimal(18,2)"), salts = 16)
        .select(col("l_returnflag"), col("total").cast("double").as("total_price"))),
    "q_skew_join" -> ((s, d) => {
      val t = Tables(s, d)
      val dim = t.customer.select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      saltedJoin(t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          dim, key = "o_custkey", factUnique = "o_orderkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
    }))

  val oracles: Map[String, String] = Map(
    "q_skew_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_skew_join" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin)
}
