package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` has shipped in three parquet shapes across testdata
    * generations: TIMESTAMP(NANOS) (readable only as a raw long under
    * the nanosAsLong legacy conf — `GraftSession` sets it at session
    * build; set defensively here for foreign sessions, idempotent for
    * graft ones), TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ since Spark infers NTZ by default), and plain
    * UTC-adjusted TIMESTAMP. Normalize all three to a microsecond
    * instant timestamp so every downstream operator — and the DuckDB
    * oracle, whose TIMESTAMP is also µs — sees identical values. The
    * session timezone is UTC, so the NTZ→instant cast relabels the
    * wall-clock value without shifting it, exactly matching DuckDB's
    * naive read. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→instant cast below relabels rather than shifts ONLY under a
    // UTC session zone; set it defensively for foreign (non-Graft) sessions.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
