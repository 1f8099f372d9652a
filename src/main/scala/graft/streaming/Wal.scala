package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DupClusters

/** Shared WAL discipline for the durable-partials maintainers
  * ([[AggMergeStream]], [[MixStream]], [[DriftStream]], [[RankStream]],
  * [[AnnStream]].deleteBatch): append-only per-batch partial rows keyed
  * by `batch_id`, replay-idempotent via the seen-check, and — the piece
  * the maintainers' 100-TB notes promised but r13 now ships — ROW-level
  * COMPACTION that folds old batch partials into one merged row-set
  * WITHOUT losing replay idempotence.
  *
  * The trap compaction must dodge: the replay guard is "skip a batch_id
  * the table already carries", so naively re-merging batches 0..m into
  * one row-set forgets ids 0..m−1 — a crash-replay of batch 3 after
  * compaction would re-append it and silently double-count. The fix is
  * a WATERMARK riding in the sign bit of `batch_id`: the compacted
  * row-set lands under `batch_id = −(m+1)`, meaning "batches 0..m are
  * folded in" (foreachBatch ids are ≥ 0, so the encoding is collision-
  * free), and [[seen]] treats id as replayed when the table carries
  * `batch_id = id` OR any watermark `batch_id ≤ −(id+1)` (more negative
  * = higher watermark = covers more ids). A later compaction folds the
  * previous watermark row-set in and re-lands under the new (more
  * negative) watermark; merged reads never look at `batch_id`, so the
  * served cards are bit-identical before and after (additive integer /
  * decimal sums — the same algebra that makes the maintainers exact).
  *
  * Scale shape: compaction reads the partials table once, writes ≤
  * #distinct-keys rows, and runs on the maintenance schedule (the
  * Store.compact cadence) — read amplification of the scheduled
  * report/refresh drops from #batches×keys back to keys. Same
  * single-maintenance-writer contract as the ingest side (see
  * MixStream.ingestBatch's scaladoc): don't compact while a backfill
  * writer races the same table.
  */
object Wal {

  /** Has `batchId` already been folded into `table` — either as live
    * partial rows under its own id, or inside a compaction watermark
    * covering it? (False when the table doesn't exist yet.) */
  def seen(spark: SparkSession, table: String, batchId: Long): Boolean =
    spark.catalog.tableExists(table) &&
      !spark.table(table)
        .filter(col("batch_id") === batchId ||
          col("batch_id") <= lit(-(batchId + 1L)))
        .limit(1).isEmpty

  /** Fold ALL current partial rows of `table` into one merged row-set
    * under the new watermark id. `keyCols` are the grouping keys,
    * `sumCols` the additive columns (each is summed then CAST back to
    * its stored type, so the compacted schema appends cleanly with
    * future batches; a NULL anywhere in a column's group poisons that
    * group's sum to NULL — missing legacy state must stay VISIBLY
    * missing, not silently undercounted — the MixStream n_tokens
    * upgrade-path contract). The rewrite re-buckets exactly as the
    * existing table (the spec is READ from catalog metadata — a caller
    * cannot mismatch it). Returns (rows before, rows after). No-op on
    * a missing or batch-less table. */
  def compactPartials(spark: SparkSession, table: String,
                      keyCols: Seq[String], sumCols: Seq[String]): (Long, Long) = {
    if (!spark.catalog.tableExists(table)) return (0L, 0L)
    val bucket = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(bs => (bs.bucketColumnNames.head, bs.numBuckets))
    val t = spark.table(table)
    val schema = t.schema
    val before = t.count()
    val bounds = t.agg(
      max(when(col("batch_id") >= 0L, col("batch_id"))).as("mx"),
      min(col("batch_id")).as("mn")).collect()(0)
    val maxPos = if (bounds.isNullAt(0)) -1L else bounds.getLong(0)
    val minAny = if (bounds.isNullAt(1)) 0L else bounds.getLong(1)
    val prevWm = if (minAny < 0L) -minAny - 1L else -1L
    val m = math.max(maxPos, prevWm)
    if (m < 0L) return (before, before) // empty table: nothing covered
    val sums = sumCols.map { c =>
      when(max(col(c).isNull.cast("int")) === 1, lit(null))
        .otherwise(sum(col(c))).cast(schema(c).dataType).as(c)
    }
    val merged = t.groupBy(keyCols.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumn("batch_id", lit(-(m + 1L)))
      .select(schema.fieldNames.toSeq.map(col): _*)
    // cut lineage before overwriting the table the plan reads from
    // (the RankStream.refresh read-then-overwrite recipe)
    val mat = DupClusters.materialize(merged)
    bucket match {
      case Some((bCol, n)) =>
        mat.write.mode("overwrite").bucketBy(n, bCol).saveAsTable(table)
      case None =>
        mat.write.mode("overwrite").saveAsTable(table)
    }
    DupClusters.release(mat)
    (before, spark.table(table).count())
  }
}
