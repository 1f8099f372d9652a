package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete/takedown leg for the durable TEXT dedup state (r15) — the
  * lesson the ANN side learned in r13 (`AnnStream.deleteBatch`),
  * applied to the text tables: without it the fingerprint/signature
  * stores and the span registry only GROW, so a taken-down corpus
  * document keeps rejecting honest re-submissions at the
  * [[IngestGate]] forever, and its spans stay scrubbed out of every
  * future document.
  *
  * Design (the MixStream/AnnStream partials discipline verbatim):
  * takedowns arrive as doc_id batches and land in an append-only WAL
  * table `(doc_id, n, batch_id)` — replay-idempotent via [[Wal.seen]],
  * empty batches through the [[Wal]] ledger so compaction's watermark
  * advances, row-level compaction via [[Wal.compactPartials]] (n sums;
  * a doc tombstoned twice is one dead doc, readers use the DISTINCT id
  * set). Single-maintenance-writer contract as everywhere.
  *
  * Serving: consumers read the durable tables THROUGH [[liveOnly]] —
  * one anti-join on doc_id against the distinct tombstoned set. The
  * stored tables are never rewritten on the takedown path (a takedown
  * is a metadata event, not a corpus rewrite); physical reclamation
  * rides the existing rebuild machinery (`Store.refresh*` /
  * `Store.publish` re-derive from the live corpus on the maintenance
  * schedule, exactly like the ANN side's refit swap).
  *
  * Re-submission contract: a re-submitted document arrives under a
  * FRESH doc_id (the [[SpanStream.dedupBatch]] precondition, now
  * shared): doc_ids are globally unique across the stream's lifetime,
  * tombstoned ids are permanently retired.
  *
  * 100 TB shape: the tombstone table holds doc_id rows only — orders
  * of magnitude below corpus scale for any real takedown volume — so
  * the anti-join's build side stays broadcastable; if a deployment
  * ever accumulates a corpus-scale tombstone set, bucket it by doc_id
  * next to the stores it filters and the anti-join is exchange-free.
  */
object Takedown {

  /** One takedown micro-batch folded into the durable tombstone WAL.
    * Replay-idempotent (batch_id skip); a batch naming no doc at all
    * still advances the compaction watermark via the empty-batch
    * ledger. */
  def tombstoneBatch(deletes: DataFrame, batchId: Long,
                     tombstonesTable: String): Unit = {
    val spark = deletes.sparkSession
    val partial = deletes.select(col("doc_id")).distinct()
      .withColumn("n", lit(1L))
      .withColumn("batch_id", lit(batchId))
      .persist()
    try {
      if (Wal.emptyRecorded(partial, tombstonesTable, batchId)) ()
      else if (!spark.catalog.tableExists(tombstonesTable))
        partial.write.saveAsTable(tombstonesTable)
      else if (!Wal.seen(spark, tombstonesTable, batchId))
        partial.write.mode("append").saveAsTable(tombstonesTable)
    } finally partial.unpersist()
  }

  /** Scheduled row-level compaction of the tombstone WAL (a
    * [[Maintenance.WalJob]] leg like every other durable-partials
    * table). */
  def compact(spark: SparkSession, tombstonesTable: String): (Long, Long) =
    Wal.compactPartials(spark, tombstonesTable,
      keyCols = Seq("doc_id"), sumCols = Seq("n"))

  /** The distinct tombstoned doc_id set (empty frame when the table
    * does not exist yet — a corpus with no takedowns filters
    * nothing). */
  def tombstonedIds(spark: SparkSession, tombstonesTable: String): DataFrame =
    if (!spark.catalog.tableExists(tombstonesTable))
      spark.range(0).select(col("id").as("doc_id"))
    else spark.table(tombstonesTable).select(col("doc_id")).distinct()

  /** `df` restricted to LIVE documents: tombstoned ids anti-joined out
    * on `idCol` (`doc_id` for the document-keyed stores; `vec_id` for
    * the semantic survivor table, whose ids ARE doc ids by the gate's
    * contract). Identity when no tombstone table is configured or none
    * exists yet. */
  def liveOnly(df: DataFrame, tombstonesTable: Option[String],
               idCol: String = "doc_id"): DataFrame =
    tombstonesTable match {
      case None => df
      case Some(t) =>
        val spark = df.sparkSession
        if (!spark.catalog.tableExists(t)) df
        else df.join(
          tombstonedIds(spark, t).withColumnRenamed("doc_id", idCol),
          Seq(idCol), "left_anti")
    }

  /** PHYSICAL reclamation of tombstoned rows from a stored id-keyed
    * table (fingerprints, signatures, the corpus itself, the span
    * registry, the semantic survivors) — the scheduled maintenance
    * twin of the [[liveOnly]] serving view, riding
    * `Store.publishLike`'s snapshot-safe versioned swap (a new backing
    * table is written WITH the table's own full bucket spec — a
    * default layout would make the next streaming append throw a
    * bucket-spec mismatch — the view repointed, the previous version
    * retained for in-flight readers: the ANN refit swap's discipline).
    * After a scrub the table IS live, so readers that bypass
    * [[liveOnly]] see the same rows as those that don't (until the
    * next takedown). Returns (rows before, rows after). Same
    * single-maintenance-writer contract as Store.compact. */
  def scrub(spark: SparkSession, table: String, tombstonesTable: String,
            idCol: String = "doc_id"): (Long, Long) = {
    if (!spark.catalog.tableExists(table)) (0L, 0L)
    else {
      val before = spark.table(table).count()
      val live = liveOnly(spark.table(table), Some(tombstonesTable), idCol)
      graft.core.Store.publishLike(spark, live, table)
      (before, spark.table(table).count())
    }
  }

  /** [[scrub]] for the ingest gate's DECISION log (r16) — the store
    * the plain id-keyed scrub cannot serve, because a tombstoned doc
    * appears there in TWO roles: as the rejected document itself
    * (`batch_id` — its own rows are DROPPED, exactly like every other
    * store) and as the CAUSE of other documents' rejections
    * (`corpus_id` — those rows belong to LIVE docs' decision history,
    * so they survive with the reference REDACTED to NULL: the row
    * still says "doc X was rejected as a near-dup", it just no longer
    * names the taken-down document). Dropping the cause rows outright
    * would silently un-count live docs from [[IngestGate.report]]'s
    * per-kind distincts; redaction keeps the report bit-identical
    * while completing the takedown contract — after this scrub the
    * log carries NO reference to the doc in either column. Same
    * versioned snapshot-safe swap, same (before, after) row counts,
    * safe (0,0) no-op on a missing table; re-runnable (a crash-replay
    * of an old batch re-derives decisions against the LIVE corpus, so
    * scrubbed references do not resurrect — and a re-run scrubs any
    * residue regardless). Single-maintenance-writer contract. */
  def scrubDecisions(spark: SparkSession, decisionsTable: String,
                     tombstonesTable: String): (Long, Long) = {
    if (!spark.catalog.tableExists(decisionsTable)) (0L, 0L)
    else {
      val before = spark.table(decisionsTable).count()
      val own = liveOnly(spark.table(decisionsTable), Some(tombstonesTable),
        idCol = "batch_id")
      val redacted =
        if (!spark.catalog.tableExists(tombstonesTable)) own
        else own
          .join(tombstonedIds(spark, tombstonesTable)
              .withColumnRenamed("doc_id", "corpus_id")
              .withColumn("__tomb", lit(true)),
            Seq("corpus_id"), "left_outer")
          .withColumn("corpus_id",
            when(col("__tomb"), lit(null).cast("long"))
              .otherwise(col("corpus_id")))
          .drop("__tomb")
          .select(spark.table(decisionsTable).columns.map(col): _*)
      graft.core.Store.publishLike(spark, redacted, decisionsTable)
      (before, spark.table(decisionsTable).count())
    }
  }
}
