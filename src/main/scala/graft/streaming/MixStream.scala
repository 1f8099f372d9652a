package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Sampling

/** Streaming realized-mixture audit (SURVEY.md §2.4) — the streaming
  * twin of `d_mix_report`: documents arrive continuously, each batch
  * folds its per-source (total, kept) MIXTURE PARTIALS into a durable
  * table, and a scheduled [[report]] serves the full audit (kept_frac
  * vs the declared target rate with absolute deviation) off the merged
  * partials at any time — the drift check a mixture rollout reads, now
  * available continuously over the live ingest instead of per offline
  * sweep.
  *
  * Same architecture as [[DriftStream]]/[[AggMergeStream]] (durable
  * partials + append-only WAL discipline, NO streaming state store),
  * because the state is algebraic: membership is a pure function of
  * (source, doc_id) (the scan-side md5 threshold — replay-identical by
  * construction) and the (n_docs, n_kept) counts are additive, so
  *
  *  - per-batch cost ∝ the BATCH (one per-source aggregate + one
  *    ≤ #sources-row append keyed by `batch_id`); document text is
  *    never stored and never rescanned by the maintainer;
  *  - crash-replay is idempotent: foreachBatch re-delivers a crashed
  *    batch under the SAME batch_id and [[ingestBatch]] skips one the
  *    table already carries;
  *  - [[report]] is DERIVED state, decoupled from ingest cadence:
  *    merge partials → [[Sampling.mixReportFromCards]] (the batch
  *    key's own arithmetic; integer partial sums equal direct counting
  *    exactly, so the served report is bit-equal to batch
  *    `d_mix_report` over the documents ingested so far, under any
  *    batch split or arrival order).
  *
  * At 100 TB: the partials table grows ≤ #sources rows per batch and
  * the report touches only partials — the maintainer is
  * corpus-size-independent after the scan each ingest batch already
  * paid; compaction of old batch partials bounds read amplification
  * exactly as in AggMergeStream. */
object MixStream {

  /** One micro-batch: append the batch's per-source (n_docs, n_kept)
    * mixture partials under its batch_id — skipping a batch_id already
    * present (crash replay).
    *
    * SINGLE-WRITER CONTRACT: the exists-check-then-append pair is not
    * atomic. It is safe exactly because foreachBatch serializes batches
    * within one stream (a crash-replayed batch re-arrives under the
    * same batch_id and is skipped); TWO streams or a concurrent
    * backfill writing the same `partialsTable` can race the check and
    * double-append, silently inflating the merged counts. Run one
    * writer per partials table — a second corpus gets its own table
    * (and [[report]] merges are per-table by construction). Where the
    * table format supports transactional MERGE, key the idempotence on
    * (writer_id, batch_id) instead to lift the restriction. */
  def ingestBatch(docs: DataFrame, batchId: Long, partialsTable: String,
                  rates: Map[String, Double], defaultRate: Double): Unit = {
    val spark = docs.sparkSession
    // token-extended partials (mixtureCapacityPartials): one durable
    // table feeds both the audit ([[report]]) and the re-plan
    // ([[waterfillPlan]])
    // a 0-row batch yields 0 partial rows (per-source groupBy) — record
    // its id in the WAL ledger so compaction's watermark can still
    // advance over it; the input check short-circuits on the first row,
    // so a non-empty batch pays no extra scan
    if (docs.limit(1).isEmpty) { Wal.markEmpty(spark, partialsTable, batchId); return }
    val partials = Sampling.mixtureCapacityPartials(docs, rates, defaultRate)
      .withColumn("batch_id", lit(batchId))
    if (!spark.catalog.tableExists(partialsTable)) {
      partials.write.saveAsTable(partialsTable)
    } else {
      // Upgrade path for a durable partials table written before the
      // token column existed (r13): evolve the schema in place so the
      // append cannot fail mid-stream. Legacy rows read n_tokens NULL —
      // the audit ([[report]]) never touches the column, and
      // [[waterfillPlan]] REFUSES to serve over NULLs (silently
      // under-counting capacity would be worse than failing).
      if (!spark.table(partialsTable).columns.contains("n_tokens"))
        spark.sql(s"ALTER TABLE $partialsTable ADD COLUMNS (n_tokens BIGINT)")
      if (!Wal.seen(spark, partialsTable, batchId)) {
        partials.write.mode("append").saveAsTable(partialsTable)
      }
    }
  }

  /** Scheduled row-level compaction of the partials WAL (see [[Wal]]):
    * one row per source after the fold; a legacy NULL n_tokens anywhere
    * in a source's partials keeps that source's compacted n_tokens NULL
    * (the [[waterfillPlan]] refusal stays armed — missing capacity must
    * never silently undercount). [[report]]/[[waterfillPlan]] are
    * bit-identical before and after (spec-proven). */
  def compact(spark: SparkSession, partialsTable: String): (Long, Long) = {
    // same upgrade as [[ingestBatch]]: a pre-token legacy table reaches
    // compaction first when the maintenance schedule fires before any
    // post-upgrade ingest — the n_tokens sum below must not throw on a
    // missing column (legacy rows read NULL, keeping the
    // [[waterfillPlan]] refusal armed exactly as on the ingest path)
    // the fold's crash-recovery side copy can be the ONLY copy (and the
    // tick now calls compact on a missing main table, r15) — a legacy
    // side copy must be upgraded too or the recovered table re-throws;
    // same for a crash-leftover recovered-union copy (__wal_fold2,
    // r16b), which a marker-trusting recovery restores main FROM
    Seq(partialsTable, partialsTable + "__wal_fold",
        partialsTable + "__wal_fold2").foreach { t =>
      if (spark.catalog.tableExists(t) &&
          !spark.table(t).columns.contains("n_tokens"))
        spark.sql(s"ALTER TABLE $t ADD COLUMNS (n_tokens BIGINT)")
    }
    Wal.compactPartials(spark, partialsTable,
      keyCols = Seq("source"), sumCols = Seq("n_docs", "n_kept", "n_tokens"))
  }

  /** Merged per-source card: ONE row per source — the
    * [[Sampling.mixReportFromCards]] input contract. Late or
    * out-of-order batches are just more partial rows; the re-merge
    * absorbs them (integer sums are order-free). */
  def mergedCards(spark: SparkSession, partialsTable: String): DataFrame =
    spark.table(partialsTable)
      .groupBy(col("source")).agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_kept")).as("n_kept"))

  /** The audit served at any time: the d_mix_report schema over
    * everything ingested so far — bit-equal to the batch operator on
    * the same documents. */
  def report(spark: SparkSession, partialsTable: String,
             rates: Map[String, Double], defaultRate: Double): DataFrame =
    Sampling.mixReportFromCards(mergedCards(spark, partialsTable),
      rates, defaultRate)

  /** Merged per-source CAPACITY card: (source, n_docs, n_tokens) —
    * the [[Sampling.waterfillFromCards]] input contract, off the same
    * partials table (token sums are additive like doc counts). */
  def mergedCapacityCards(spark: SparkSession, partialsTable: String): DataFrame = {
    // loud, not silently wrong: a pre-r13 partials row carries no token
    // sum, and a capacity plan summed over NULLs would under-allocate
    // the affected sources invisibly — demand a backfill/re-ingest
    val legacy = spark.table(partialsTable)
      .filter(col("n_tokens").isNull).limit(1).count()
    require(legacy == 0L,
      s"$partialsTable carries pre-token (legacy) partial rows — backfill " +
        "or re-ingest them before serving a capacity re-plan " +
        "(the audit report remains servable)")
    spark.table(partialsTable)
      .groupBy(col("source")).agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
  }

  /** The mixture RE-PLAN served at any time — the d_mix_waterfill
    * allocation over everything ingested so far, bit-equal to the
    * batch planner on the same documents (additive integer cards →
    * [[Sampling.waterfillFromCards]], the same exact-integer
    * feasibility arithmetic). This closes the plan→audit loop the
    * batch-only planner left open: the audit ([[report]]) watches the
    * realized mixture drift while THIS re-computes what the optimal
    * allocation now is as capacity accrues — both off the one durable
    * partials table, neither rescanning a document. */
  def waterfillPlan(spark: SparkSession, partialsTable: String,
                    budgetTokens: Long = 100000L,
                    parts: Map[String, Int] = Sampling.EpochParts,
                    defaultPart: Int = Sampling.EpochPartDefault,
                    maxEpochs: Long = 4L): DataFrame =
    Sampling.waterfillFromCards(mergedCapacityCards(spark, partialsTable),
      budgetTokens, parts, defaultPart, maxEpochs)

  /** Start the continuous ingest over a document stream; [[report]]
    * serves on its own schedule against the table this maintains. */
  def start(docs: DataFrame, partialsTable: String, checkpointDir: String,
            rates: Map[String, Double], defaultRate: Double): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, partialsTable, rates, defaultRate)
      }
      .start()
}
