package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{DomainGraph, DupClusters}

/** Streaming host-rank maintenance (SURVEY.md §2.4) — the streaming
  * twin of `d_rank_delta`: link-edge deltas arrive continuously (a
  * crawl frontier emitting (src, dst) host links), fold into a durable
  * edge-WEIGHT partials table, and a scheduled [[refresh]] warm-starts
  * the power iteration from the stored rank snapshot — the
  * incremental-PageRank loop run as a standing pipeline instead of a
  * hand-kicked batch job.
  *
  * Same architecture as [[AggMergeStream]] (no streaming state store;
  * durable tables + append-only WAL discipline), because the state IS
  * algebraic: link weights are additive counts, so
  *
  *  - per-batch cost ∝ the BATCH (one (src, dst) aggregate of the
  *    batch's edges + one append keyed by `batch_id`); raw edges are
  *    never stored, never rescanned;
  *  - crash-replay is idempotent: foreachBatch re-delivers a crashed
  *    batch under the SAME batch_id and [[ingestBatch]] skips one the
  *    table already carries — the standard exactly-once recipe;
  *  - [[refresh]] is DERIVED state, decoupled from ingest cadence (the
  *    production shape: ingest continuously, refresh on a schedule):
  *    re-merge partials → warm-start 3 power iterations from the
  *    previous snapshot → overwrite the snapshot. A missing snapshot
  *    (first refresh) degrades to the cold uniform start at the cold
  *    iteration count, so the maintainer self-bootstraps.
  *
  * The refresh's arithmetic is [[DomainGraph.domainRankDeltaFromWeights]]
  * — the exact-decimal chain of the batch operator over the summed
  * partials, which equal the direct per-pair counts exactly (integer
  * addition is associative across batch splits) — so the streamed
  * snapshot is BIT-EQUAL to the batch `d_rank_delta` over the same
  * edge multiset (spec-proven, StreamingSpec).
  *
  * At 100 TB: the partials table is bucketed by src (co-locates the
  * re-merge and the out-degree aggregate), partial volume per batch is
  * ≤ distinct (src, dst) pairs touched — far below link volume on real
  * crawls (hosts repeat) — and compaction of old batches bounds read
  * amplification exactly as in AggMergeStream; refresh cost is the
  * delta operator's: a few two-shuffle rounds over one-row-per-host
  * tables, corpus-text-independent. */
object RankStream {

  /** One micro-batch: append the batch's (src, dst) weight partials
    * under its batch_id — skipping a batch_id already present (crash
    * replay). `edges` carries one row per link. */
  def ingestBatch(edges: DataFrame, batchId: Long, weightsTable: String,
                  buckets: Int = 8): Unit = {
    val spark = edges.sparkSession
    // a 0-row batch yields 0 partial rows — record its id in the WAL
    // ledger so compaction's watermark can advance over it (the input
    // check short-circuits on the first row)
    if (edges.limit(1).isEmpty) { Wal.markEmpty(spark, weightsTable, batchId); return }
    val partials = edges
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .withColumn("batch_id", lit(batchId))
    if (!spark.catalog.tableExists(weightsTable)) {
      partials.write.bucketBy(buckets, "src").saveAsTable(weightsTable)
    } else if (!Wal.seen(spark, weightsTable, batchId)) {
      partials.write.mode("append").bucketBy(buckets, "src")
        .saveAsTable(weightsTable)
    }
  }

  /** Scheduled row-level compaction of the weight WAL (see [[Wal]]):
    * one row per (src, dst) after the fold — [[refresh]]/[[hitsCard]]
    * read identical merged weights before and after (spec-proven). */
  def compact(spark: SparkSession, weightsTable: String): (Long, Long) =
    Wal.compactPartials(spark, weightsTable,
      keyCols = Seq("src", "dst"), sumCols = Seq("w"))

  /** Merged weight view: ONE row per (src, dst) — the
    * [[DomainGraph.domainRankDeltaFromWeights]] input contract. Late or
    * out-of-order edge batches are just more partial rows; the re-merge
    * absorbs them (integer sums are order-free). */
  def weights(spark: SparkSession, weightsTable: String): DataFrame =
    spark.table(weightsTable)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))

  /** The scheduled warm refresh: 3 power iterations from the stored
    * snapshot over the current merged weights, then overwrite the
    * snapshot. Returns the full drift card (host, pagerank, prev_rank,
    * delta) — what moved since the last refresh. A missing snapshot
    * cold-starts at `coldIters` (the batch operator's quality horizon).
    *
    * The card is materialized (localCheckpoint — one row per host)
    * BEFORE the snapshot overwrite: the refresh reads the table it is
    * about to replace, and the cut lineage is what makes the
    * read-then-overwrite legal. */
  def refresh(spark: SparkSession, weightsTable: String, ranksTable: String,
              iters: Int = 3, coldIters: Int = 10): DataFrame = {
    val warm = spark.catalog.tableExists(ranksTable)
    val prev =
      if (warm) spark.table(ranksTable)
      else spark.range(0).select(lit("").as("host"), lit(0.0).as("pagerank")).limit(0)
    val card = DupClusters.materialize(DomainGraph.domainRankDeltaFromWeights(
      weights(spark, weightsTable), prev, iters = if (warm) iters else coldIters))
    card.select(col("host"), col("pagerank"))
      .write.mode("overwrite").saveAsTable(ranksTable)
    card
  }

  /** HITS hubs/authorities served off the SAME maintained weight
    * partials — the second centrality the stored table already pays
    * for (the MixStream waterfillPlan pattern: one durable partials
    * table, several scheduled cards). Summed partials equal the batch
    * operator's direct pair counts exactly (integer addition is
    * order-free across batch splits), and [[DomainGraph
    * .domainHitsFromWeights]] is the batch key's own exact-decimal
    * arithmetic — so the served card is BIT-EQUAL to batch
    * d_domain_hits over the same edge multiset under any batch split
    * or arrival order (spec-proven). Stateless beyond the weights: no
    * snapshot to rotate — HITS re-derives from the merged weights at
    * the fixed 5-iteration horizon each run. */
  def hitsCard(spark: SparkSession, weightsTable: String, iters: Int = 5): DataFrame =
    DomainGraph.domainHitsFromWeights(weights(spark, weightsTable), iters)

  /** Start the continuous ingest over an edge stream; [[refresh]] runs
    * on its own schedule against the tables this maintains. */
  def start(edges: DataFrame, weightsTable: String, checkpointDir: String,
            buckets: Int = 8): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, weightsTable, buckets)
      }
      .start()
}
