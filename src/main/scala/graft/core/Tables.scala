package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's parquet tables under one scale-factor dir.
  *
  * All reads are plain `spark.read.parquet` — projections and filters
  * applied downstream are pushed into the scan by Catalyst (verify with
  * `.explain`: `PushedFilters` / `ReadSchema`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 only reads
    * via the nanosAsLong legacy conf (as a raw long). `GraftSession`
    * sets it at session build; for sessions built elsewhere (e.g. a
    * harness calling `SparkEntry.entry` with its own session) we set it
    * defensively before the read — same value, so this is idempotent for
    * graft sessions and only mutates foreign ones that would otherwise
    * fail the read outright. Normalize to a microsecond timestamp so
    * every downstream operator — and the DuckDB oracle, whose TIMESTAMP
    * is also µs — sees identical values. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
