package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dedup

/** Streaming span-level exact-substring dedup (SURVEY.md §2.4): the
  * batch `Dedup.spanDedup` operator (duplicated k-token runs REMOVED
  * from the text, Lee et al. 2022's actual output) run continuously
  * over a stream of arriving documents.
  *
  * Same architecture as [[IngestGate]] — no streaming state store: the
  * state is a durable FIRST-OCCURRENCE REGISTRY `(span, doc_id,
  * span_idx)` holding every span the stream has kept so far, with the
  * keeper's provenance. Each micro-batch:
  *
  *   1. cuts its documents into spans (`Dedup.spanCut`, scan-side);
  *   2. keeps a span iff it is not in the registry AND is the batch's
  *      own first occurrence (window over (doc_id, span_idx) — the
  *      batch-local half of the batch operator's global window);
  *   3. reassembles surviving text per document (`Dedup.spanAssemble`)
  *      and appends to the cleaned-output table;
  *   4. registers the kept spans' provenance.
  *
  * Sequencing semantics: a span is owned by the EARLIEST BATCH that
  * carried it (then (doc_id, span_idx) within the batch) — the
  * streaming analogue of the batch operator's global (doc_id,
  * span_idx) first-occurrence order, and identical to it whenever
  * batches arrive in doc_id order (StreamingSpec proves the
  * equivalence on an ordered split, and the cross-batch removal on an
  * unordered one).
  *
  * Crash-replay idempotency, same WAL discipline as the ingest gate:
  * the registry IS the decision log. A replayed batch reconstructs the
  * registry-as-of-before-the-batch by excluding rows its own doc_ids
  * registered (broadcast anti-join probe), so its keep decisions are
  * re-derived identically; the cleaned-output append anti-joins out
  * doc_ids a crashed attempt already landed, and the registry append
  * adds only spans not yet present.
  *
  * 100 TB shape: work per batch ∝ batch spans; the registry is read
  * through one equi-join on the span key per batch (bucketed by span,
  * so the stored side joins without a shuffle) and only ever grows by
  * the batch's NEW spans. Registry size is the corpus's distinct-span
  * count — the same asymptotic footprint as the batch operator's
  * shuffle, held durable instead of recomputed per run.
  */
object SpanStream {

  /** One micro-batch through the span gate — also directly callable as
    * the batch-mode unit.
    *
    * PRECONDITION (same contract as [[IngestGate]]): `doc_id` is
    * globally unique across the stream's lifetime. The crash-replay
    * idempotency below keys the cleaned-output anti-join on `doc_id`
    * alone, so a LEGITIMATE re-ingest of an already-landed doc_id with
    * different text is indistinguishable from a replayed crash and is
    * silently dropped from the output. Re-ingested revisions must
    * arrive under a fresh doc_id (or the output table must be compacted
    * first). */
  def dedupBatch(batch: DataFrame, registryTable: String, outputTable: String,
                 k: Int = 20, buckets: Int = 8,
                 tombstones: Option[String] = None): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val haveRegistry = spark.catalog.tableExists(registryTable)
    val batchIds = batch.select(col("doc_id"))
    // Takedown leg (r15): registry rows whose KEEPER doc is tombstoned
    // are dead — their spans are released, so the next document
    // carrying one keeps it (and re-registers it under the new
    // keeper's provenance). The physical rows stay until the registry
    // is rebuilt on the maintenance schedule; every read below goes
    // through the live view.
    def liveRegistry(): DataFrame =
      Takedown.liveOnly(spark.table(registryTable), tombstones)
    val spans = Dedup.spanCut(batch, k)
    // batch-local first occurrence (the in-batch half of the global rule)
    val firstInBatch = spans
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("span")).orderBy(col("doc_id"), col("span_idx"))))
      .filter(col("rn") === 1).drop("rn")
    // registry as of BEFORE this batch: on crash-replay the registry
    // already holds this batch's spans; excluding rows registered by
    // the batch's own doc_ids reconstructs the original decisions
    // (no-op on a clean run — the probe is a broadcast batch-id set)
    // The keep decision is MATERIALIZED (eager localCheckpoint, ∝ batch
    // spans) before either table is mutated: every write below derives
    // from this frozen frame, so no write's plan can re-read a table the
    // batch has already appended to (the refreshDocDerived self-read
    // hazard), and both appends see one consistent decision set.
    val kept = (
      if (!haveRegistry) firstInBatch
      else {
        val registry = liveRegistry()
          .join(broadcast(batchIds), Seq("doc_id"), "left_anti")
        firstInBatch.join(registry.select(col("span")), Seq("span"), "left_anti")
      }).localCheckpoint()
    // WAL ordering: register kept spans FIRST (idempotent: a replay's
    // anti-join finds them present and appends nothing), then land the
    // cleaned output derived from the same frozen kept set.
    val newRows = kept.select(col("span"), col("doc_id"), col("span_idx"))
    // the presence probe uses the LIVE registry too: a span whose only
    // keeper was tombstoned re-registers under its new keeper (the dead
    // row stays physical; reads filter it, so the span still has ONE
    // live keeper)
    val toRegister = (
      if (!haveRegistry) newRows
      else newRows.join(liveRegistry().select(col("span")),
        Seq("span"), "left_anti")).localCheckpoint()
    // appends land on the current backing when the registry has been
    // scrubbed into a versioned view (Takedown.scrub, r15)
    toRegister.write.mode(if (haveRegistry) "append" else "overwrite")
      .bucketBy(buckets, "span")
      .saveAsTable(if (haveRegistry)
        graft.core.Store.appendTarget(spark, registryTable) else registryTable)
    val cleaned = Dedup.spanAssemble(kept)
    val haveOutput = spark.catalog.tableExists(outputTable)
    val toAppend =
      if (!haveOutput) cleaned
      else cleaned.join(spark.table(outputTable).select(col("doc_id"))
        .join(broadcast(batchIds), Seq("doc_id"), "left_semi").localCheckpoint(),
        Seq("doc_id"), "left_anti")
    toAppend.write.mode(if (haveOutput) "append" else "overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(if (haveOutput)
        graft.core.Store.appendTarget(spark, outputTable) else outputTable)
  }

  /** Start the continuous span-dedup gate over a document stream. */
  def start(docs: DataFrame, registryTable: String, outputTable: String,
            checkpointDir: String, k: Int = 20, buckets: Int = 8,
            tombstones: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch, registryTable, outputTable, k, buckets, tombstones)
      }
      .start()
}
