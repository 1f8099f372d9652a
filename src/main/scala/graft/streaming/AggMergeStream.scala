package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

import graft.queries.AnalyticsQueries

/** Streaming incremental aggregate maintenance (SURVEY.md §2.4): the
  * q_agg_merge two-level rollup run CONTINUOUSLY — each micro-batch of
  * purchase events folds into a durable DAILY-partials table, and the
  * weekly report is served from the stored partials at any time,
  * never from raw history.
  *
  * Same architecture as [[IngestGate]] / [[SpanStream]] — no streaming
  * state store: the state is the durable partials table, and the WAL
  * discipline is append-only per-batch partial rows keyed by
  * `batch_id`. The daily view re-merges partials on read (count/sum
  * are algebraic: partials of partials ≡ direct — the exact property
  * q_agg_merge's spec proves), so:
  *
  *  - per-batch cost ∝ the BATCH (one aggregate of the batch's events
  *    + one append); the stored corpus is never rescanned;
  *  - LATE data is just a new partial row for an old (user, day) —
  *    the re-merge absorbs it with no rewrite of existing rows (the
  *    "one-partition patch instead of a full-history rescan" the batch
  *    operator's doc promises, realized);
  *  - crash-replay is idempotent: foreachBatch re-delivers a crashed
  *    batch under the SAME batch_id, and [[mergeBatch]] skips a
  *    batch_id the table already carries — the standard foreachBatch
  *    exactly-once recipe, same WAL-first shape as the ingest gate's
  *    decision log.
  *
  * At 100 TB: the partials table is bucketed by user_id (co-locates
  * the re-merge and the weekly rollup), partial volume per batch is
  * ≤ distinct (user, day) pairs touched — orders of magnitude below
  * event volume — and `Store.compact`-style re-merge of old batches
  * bounds read amplification; the weekly serve is two #partials-row
  * aggregates, corpus-size-independent. */
object AggMergeStream {

  /** One micro-batch: append the batch's (user, day) partials under its
    * batch_id — skipping a batch_id already present (crash replay). */
  def mergeBatch(batch: DataFrame, batchId: Long, partialsTable: String,
                 buckets: Int = 8): Unit = {
    val spark = batch.sparkSession
    // a 0-row batch yields 0 partial rows — record its id in the WAL
    // ledger so compaction's watermark can advance over it (the input
    // check short-circuits on the first row)
    if (batch.limit(1).isEmpty) { Wal.markEmpty(spark, partialsTable, batchId); return }
    val partials = AnalyticsQueries.dailyPartials(batch)
      .withColumn("batch_id", lit(batchId))
    if (!spark.catalog.tableExists(partialsTable)) {
      partials.write.bucketBy(buckets, "user_id").saveAsTable(partialsTable)
    } else if (!Wal.seen(spark, partialsTable, batchId)) {
      partials.write.mode("append").bucketBy(buckets, "user_id")
        .saveAsTable(partialsTable)
    }
  }

  /** Scheduled row-level compaction of the partials WAL (see [[Wal]]):
    * folds all batches into one (user, day) row-set under the
    * watermark id — replay stays idempotent, [[daily]]/[[weekly]] are
    * bit-identical before and after (spec-proven). */
  def compact(spark: SparkSession, partialsTable: String): (Long, Long) =
    Wal.compactPartials(spark, partialsTable,
      keyCols = Seq("user_id", "day"), sumCols = Seq("n", "total"))

  /** Merged daily view: ONE row per (user_id, day) — the
    * [[AnalyticsQueries.weeklyFromDaily]] input contract. The sums
    * re-enter DECIMAL(18,2) so the stored-partials path carries the
    * same exact type the direct daily aggregate produces. */
  def daily(spark: SparkSession, partialsTable: String): DataFrame =
    spark.table(partialsTable)
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("n")).as("n"),
        sum(col("total")).cast(DecimalType(18, 2)).as("total"))

  /** The weekly report served off the stored partials — equals the
    * batch q_agg_merge over everything streamed so far (spec-proven,
    * including out-of-order/late batches). */
  def weekly(spark: SparkSession, partialsTable: String): DataFrame =
    AnalyticsQueries.weeklyFromDaily(daily(spark, partialsTable))

  /** Start the continuous maintainer over an event stream
    * ([[VehicleStream.eventStream]] provides the normalized source). */
  def start(events: DataFrame, partialsTable: String, checkpointDir: String,
            buckets: Int = 8): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, partialsTable, buckets)
      }
      .start()
}
