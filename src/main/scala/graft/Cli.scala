package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.GraftSession

/** CLI dispatcher — parity with the reference's `main.go:13-152`
  * (`-query top10|stats|routes|bearing|bearing_summary`), extended to
  * every SparkEntry key.
  *
  * Usage:
  *   runMain graft.Cli --data /root/testdata/sf0.001 --query v_top10_fastest
  *   runMain graft.Cli --query list
  */
object Cli {

  /** Reference query aliases (main.go flag values) → SparkEntry keys. */
  val aliases: Map[String, String] = Map(
    "top10"           -> "v_top10_fastest",
    "stats"           -> "v_summary_stats",
    "routes"          -> "v_route_breakdown",
    "bearing"         -> "v_bearing_filter",
    "bearing_summary" -> "v_bearing_summary")

  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    val key = aliases.getOrElse(query, query)
    SparkEntry.queries.getOrElse(key,
      throw new IllegalArgumentException(
        s"unknown query '$query'; use --query list"))(spark, dir)
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val dir = opts.getOrElse("--data", "/root/testdata/sf0.001")
    val query = opts.getOrElse("--query", "list")
    if (query == "list") {
      println(("aliases: " + aliases.keys.toSeq.sorted.mkString(", ")))
      println(("keys: " + SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      return
    }
    val spark = GraftSession.local()
    try run(spark, dir, query).show(50, truncate = false)
    finally spark.stop()
  }
}
