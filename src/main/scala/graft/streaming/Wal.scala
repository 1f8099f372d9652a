package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * a WATERMARK riding in the sign bit of `batch_id`: the folded row-set
  * lands under `batch_id = −(w+1)`, meaning "batches 0..w are folded
  * in" (foreachBatch ids are ≥ 0, so the encoding is collision-free),
  * and [[seen]] treats id as replayed when the table carries
  * `batch_id = id` OR any watermark `batch_id ≤ −(id+1)` (more negative
  * = higher watermark = covers more ids). Two guards on the fold:
  *
  *  - GAP SAFETY: the watermark only ever advances over the CONTIGUOUS
  *    id prefix actually present (previous watermark + consecutively
  *    present ids). Ids beyond a gap keep their own rows un-folded —
  *    a watermark past a hole would silently convert the missing id's
  *    FIRST ingest into a replay no-op, permanently undercounting.
  *  - DURABILITY: the partials ARE the maintainers' source of truth
  *    (unlike a rank snapshot there is nothing to cold-bootstrap them
  *    from), so the fold is first written to a durable side table
  *    (`<table>__wal_fold`), the main table is only then overwritten
  *    FROM that side copy, and the side copy dropped last. A crash in
  *    any window leaves at least one complete durable copy; a leftover
  *    side table is detected on the next compaction and the swap
  *    finished idempotently before new work starts — and the recovery
  *    is itself crash-safe (r16b): the recovered union goes durable
  *    (`__wal_fold2` + a completion marker) before the main table is
  *    touched, so even crash → resumed ingest → crash-mid-recovery
  *    loses nothing (see the recovery block in [[compactPartials]]).
  *
  * A later compaction folds the previous watermark row-set in and
  * re-lands under the new watermark; merged reads never look at
  * `batch_id`, so the served cards are bit-identical before and after
  * (additive integer / decimal sums — the same algebra that makes the
  * maintainers exact).
  *
  * Scale shape: compaction reads the partials table once, writes ≤
  * #distinct-keys (+ un-foldable tail) rows, and runs on the
  * maintenance schedule (the Store.compact cadence) — read
  * amplification of the scheduled report/refresh drops from
  * #batches×keys back to keys. The distinct-id read-off is ≤ #batches
  * rows (model-scale by the same argument as the partials themselves).
  * Same single-maintenance-writer contract as the ingest side (see
  * MixStream.ingestBatch's scaladoc): don't compact while a backfill
  * writer races the same table.
  *
  * EMPTY batches (a delete batch matching nothing, partials
  * aggregating to 0 rows) would leave a permanent HOLE under the
  * contiguous-prefix rule — no row ever lands under their id, so the
  * watermark could never advance past them and compaction would stop
  * bounding WAL growth forever after. They are instead recorded in a
  * tiny side LEDGER (`<table>__wal_ids`, one `batch_id` row per empty
  * batch — ≤ #batches rows, model-scale): [[seen]] consults it, the
  * watermark treats its ids as present, and compaction prunes ledger
  * ids once the watermark covers them. The ledger needs no
  * crash-durability ceremony at RECORD time (an empty batch's replay
  * appends no data regardless), but its PRUNE does (r15): a
  * partially-kept ledger is rewritten via the same side-copy-then-swap
  * as the partials fold (kept ids + a watermark tombstone `−(covered+1)`
  * land in `<ledger>__side` first), because a committed streaming batch
  * is never re-delivered — a kept id lost to a crash mid-rewrite would
  * never be re-recorded and the watermark would stall permanently. A
  * FULLY covered ledger is dropped outright (atomic; every dropped id
  * lives on under the main table's stored watermark). The RECOVERY of
  * a crashed prune is APPEND-ONLY as of r16 (see [[recoverLedger]]) —
  * it never overwrites either copy, so no crash window inside the
  * recovery itself can lose an id either.
  */
object Wal {

  private def ledgerTable(table: String): String = table + "__wal_ids"
  private def ledgerSide(table: String): String = ledgerTable(table) + "__side"

  /** Highest watermark encoded in a set of ledger/partials ids
    * (negative rows encode "ids ≤ −v−1 covered"); −1 when none. */
  private def wmOf(ids: Iterable[Long]): Long =
    ids.filter(_ < 0L).map(v => -v - 1L).foldLeft(-1L)(math.max)

  /** Finish a crashed ledger prune (r15; recovery protocol rewritten
    * r16): a leftover `<ledger>__side` is the durable pruned copy.
    *
    * The r15 recovery rebuilt the ledger by an in-place overwrite from
    * a non-durable union — so a crash mid-overwrite (drop + create)
    * could lose an id a resumed writer had appended to a re-created
    * ledger in the prune's own crash window: the side copy survives
    * but never covered that id, the committed streaming batch is never
    * re-delivered to re-record it, and the watermark stalls forever —
    * the exact failure class the prune fix exists to close, one level
    * down. (Overwriting the SIDE first has the mirror-image hole: a
    * crash mid-side-overwrite destroys the only copy of the kept ids
    * while the ledger holds only the post-crash appends.)
    *
    * The r16 recovery is APPEND-ONLY — no step ever destroys a durable
    * copy of any id:
    *  - ledger missing: create it from the side copy (a crash leaves
    *    the side intact; the re-run recreates);
    *  - ledger present: append the side rows the ledger does not
    *    already carry (a crash mid-append loses no existing row; the
    *    re-run appends whatever is still missing);
    *  - drop the side LAST, once every side row is represented.
    * Duplicate ledger rows from a crash-windowed re-run are harmless
    * by construction: [[seen]] filters, [[wmOf]] maxes, and the next
    * prune rewrites the distinct kept set. Stale ids below the side
    * watermark that the crashed prune meant to drop simply survive
    * until the next prune covers them — correct, just unpruned. */
  private def recoverLedger(spark: SparkSession, table: String): Unit = {
    val ledger = ledgerTable(table)
    val side = ledgerSide(table)
    if (spark.catalog.tableExists(side)) {
      if (!spark.catalog.tableExists(ledger))
        spark.table(side).write.saveAsTable(ledger)
      else {
        // both id sets are model-scale (≤ #batches rows)
        val have = spark.table(ledger).select(col("batch_id")).distinct()
          .collect().map(_.getLong(0)).toSet
        val missing = spark.table(side).select(col("batch_id")).distinct()
          .collect().map(_.getLong(0)).filterNot(have).toSeq.sorted
        if (missing.nonEmpty) {
          import spark.implicits._
          missing.toDF("batch_id").write.mode("append").saveAsTable(ledger)
        }
      }
      spark.sql(s"DROP TABLE $side")
    }
  }

  /** ROTATE an accumulation window (r16, for windowed maintainers like
    * [[ModelStream]]): drop the partials table and its WAL apparatus,
    * leaving behind ONE ledger watermark tombstone covering every id
    * the window ever saw — so the stream's checkpointed batch ids can
    * RESUME past the reset with (a) replays of pre-rotation ids
    * no-ops ([[seen]] reads the tombstone) and (b) compaction still
    * able to advance in the new window (the fold seeds its watermark
    * from the ledger tombstone too, bridging the 0..M id gap a
    * mid-stream reset otherwise leaves unfoldable forever).
    *
    * Crash-safe by ordering: the tombstone lands in the durable ledger
    * SIDE table FIRST (the prune-recovery channel — [[seen]] consults
    * it and the next compaction's [[recoverLedger]] folds it into a
    * fresh ledger), and only then are the window's tables dropped. A
    * crash anywhere re-runs to a consistent state: before the side
    * write the old window is fully intact; after it every old id is
    * covered whether or not the drops finished — re-running rotate
    * completes the reset. Single-maintenance-writer contract: don't
    * rotate while the window's ingest writer races. */
  def rotate(spark: SparkSession, table: String): Unit = {
    def idsOf(t: String): Seq[Long] =
      if (!spark.catalog.tableExists(t)) Seq.empty
      else spark.table(t).select(col("batch_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
    val ledger = ledgerTable(table)
    val side = ledgerSide(table)
    val all = idsOf(table) ++ idsOf(ledger) ++ idsOf(side)
    val maxSeen = all.map(v => if (v < 0L) -v - 1L else v)
      .foldLeft(-1L)(math.max)
    if (maxSeen >= 0L) {
      import spark.implicits._
      // overwrite is safe: any kept ids a crashed prune left in the
      // side are <= maxSeen, so the tombstone covers them outright
      Seq(-(maxSeen + 1L)).toDF("batch_id")
        .write.mode("overwrite").saveAsTable(side)
    }
    Seq(table, table + "__wal_fold", table + "__wal_fold2",
        table + "__wal_fold_ok", ledger)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** Has `batchId` already been folded into `table` — as live partial
    * rows under its own id, inside a compaction watermark covering it,
    * or recorded in the empty-batch ledger? (False when neither table
    * exists yet.) */
  def seen(spark: SparkSession, table: String, batchId: Long): Boolean = {
    // a ledger id may transiently live only in the prune side copy (a
    // crash between the side write and the swap) — consult both, read-
    // only; the next compaction finishes the swap. The ledger also
    // carries watermark tombstones (r15 prune), covered like the main
    // table's.
    def hit(t: String): Boolean =
      spark.catalog.tableExists(t) &&
        !spark.table(t)
          .filter(col("batch_id") === batchId ||
            col("batch_id") <= lit(-(batchId + 1L)))
          .limit(1).isEmpty
    hit(table) || hit(ledgerTable(table)) || hit(ledgerSide(table))
  }

  /** Record `batchId` as delivered-but-empty so the compaction
    * watermark can advance over it (idempotent under crash replay —
    * an already-seen id is skipped). */
  def markEmpty(spark: SparkSession, table: String, batchId: Long): Unit =
    if (!seen(spark, table, batchId)) {
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").saveAsTable(ledgerTable(table))
    }

  /** True — and the id is recorded in the empty-batch ledger — when
    * `partials` carries no rows; the maintainers call this before
    * appending so a 0-row batch still advances the watermark. */
  def emptyRecorded(partials: DataFrame, table: String, batchId: Long): Boolean =
    if (partials.limit(1).isEmpty) {
      markEmpty(partials.sparkSession, table, batchId); true
    } else false

  /** Rewrite `df` as `target`, reproducing the FULL bucket spec of
    * `specFrom` (every bucket column and any sort columns — a partial
    * reconstruction would silently change the physical layout the
    * maintainers' zero-exchange joins rely on). */
  private def writeLike(spark: SparkSession, df: DataFrame, target: String,
                        specFrom: String): Unit = {
    val spec = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(specFrom))
      .bucketSpec
    val w = df.write.mode("overwrite")
    spec match {
      case Some(bs) =>
        val wb = w.bucketBy(bs.numBuckets,
          bs.bucketColumnNames.head, bs.bucketColumnNames.tail: _*)
        val ws =
          if (bs.sortColumnNames.nonEmpty)
            wb.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
          else wb
        ws.saveAsTable(target)
      case None => w.saveAsTable(target)
    }
  }

  /** Fold the contiguous-prefix batches of `table` into one merged
    * row-set under the advanced watermark id. `keyCols` are the
    * grouping keys, `sumCols` the additive columns (each is summed then
    * CAST back to its stored type, so the compacted schema appends
    * cleanly with future batches; a NULL anywhere in a column's group
    * poisons that group's sum to NULL — missing legacy state must stay
    * VISIBLY missing, not silently undercounted — the MixStream
    * n_tokens upgrade-path contract). Rows whose ids sit beyond a gap
    * in the id sequence are passed through untouched (see the class
    * doc's gap-safety guard). Returns (rows before, rows after). No-op
    * on a missing table or when no contiguous prefix exists yet. */
  def compactPartials(spark: SparkSession, table: String,
                      keyCols: Seq[String], sumCols: Seq[String]): (Long, Long) = {
    val side = table + "__wal_fold"
    // crash recovery FIRST (a crash mid-swap can leave the side copy as
    // the ONLY copy — the main-table existence check must not short-
    // circuit past it): a leftover side table means a prior fold wrote
    // its state durably but died before (or during) the main-table
    // swap. Finish the swap, PRESERVING any rows a resumed writer may
    // have landed in a re-created main table in the crash window: a
    // main row survives iff the side copy does not already cover its
    // id (not folded under the side watermark, not among the side's
    // passed-through ids). The bucket spec comes from the side copy —
    // it was written with the main table's spec.
    //
    // The recovery is itself crash-safe as of r16b. DATA partials
    // cannot be append-recovered the way the ledger is (a folded
    // watermark row plus the unfolded rows it covers would
    // double-count), so the r16 recovery overwrote main in place from
    // a non-durable union — a SECOND crash mid-overwrite lost any
    // resumed-writer rows landed inside the FIRST crash's window.
    // Closed by making the union durable BEFORE main is touched:
    //  - the recovered union (side ∪ main extras) is written to a
    //    second side table (`__wal_fold2`), then a marker table
    //    (`__wal_fold_ok`) is created strictly AFTER that write
    //    completes — marker present ⇒ the union copy is complete;
    //  - only then is main overwritten FROM the durable union copy;
    //  - teardown drops marker FIRST, then the union copy, then the
    //    original side LAST — so marker+union can only ever coexist
    //    with the side table, and a stale union from a finished
    //    recovery can never be mistaken for a fresh one.
    // A crash in any window re-runs to convergence: union incomplete
    // (no marker) ⇒ main is still intact with its extras, the partial
    // union copy is discarded and rebuilt; union complete (marker) ⇒
    // the extras are durable, the main rewrite replays idempotently
    // (a partial main's rows are a subset of the side's row-set, so
    // the extras filter re-derives the identical union). Ingest that
    // RESUMES between the crash and this recovery is safe; ingest
    // racing CONCURRENTLY with the recovery itself stays out of
    // contract (the single-maintenance-writer rule above).
    if (spark.catalog.tableExists(side)) {
      val side2 = table + "__wal_fold2"
      val marker = table + "__wal_fold_ok"
      if (!(spark.catalog.tableExists(marker) &&
            spark.catalog.tableExists(side2))) {
        // partial union copy (no marker) or orphan marker — discard
        if (spark.catalog.tableExists(side2)) spark.sql(s"DROP TABLE $side2")
        if (spark.catalog.tableExists(marker)) spark.sql(s"DROP TABLE $marker")
        val s = spark.table(side)
        val recovered =
          if (!spark.catalog.tableExists(table)) s
          else {
            val sideIds = s.select(col("batch_id")).distinct()
              .collect().map(_.getLong(0))
            val sideWm = sideIds.filter(_ < 0L).sorted.headOption
              .map(v => -v - 1L).getOrElse(-1L)
            val passIds = sideIds.filter(_ >= 0L)
            s.unionByName(spark.table(table)
              .filter(col("batch_id") > sideWm &&
                !col("batch_id").isInCollection(passIds)))
          }
        writeLike(spark, recovered, side2, side)
        spark.range(1).select(lit(1L).as("ok"))
          .write.saveAsTable(marker)
      }
      // the union copy is complete and durable — swap main from it
      writeLike(spark, spark.table(side2), table, side)
      spark.sql(s"DROP TABLE $marker")
      spark.sql(s"DROP TABLE $side2")
      spark.sql(s"DROP TABLE $side")
    }
    // ledger prune crash recovery (same rule as the partials fold —
    // the side copy is the durable pruned state; finish the swap)
    recoverLedger(spark, table)
    if (!spark.catalog.tableExists(table)) return (0L, 0L)
    val ledger = ledgerTable(table)
    val t = spark.table(table)
    val schema = t.schema
    val before = t.count()
    // distinct ids reach the driver: ≤ #batches + 1 rows, model-scale
    val ids = t.select(col("batch_id")).distinct().collect().map(_.getLong(0))
    val allLedgerIds: Set[Long] =
      if (spark.catalog.tableExists(ledger))
        spark.table(ledger).select(col("batch_id")).distinct()
          .collect().map(_.getLong(0)).toSet
      else Set.empty
    val ledgerIds = allLedgerIds.filter(_ >= 0L) // tombstones are not ids
    // the watermark floor reads LEDGER tombstones too (r16): a prune's
    // tombstone never exceeds the data table's stored watermark, so
    // this is a no-op in the steady state — but after a window
    // [[rotate]] the ledger tombstone is the ONLY record that ids
    // 0..M happened, and without it the fold could never advance over
    // the id gap a mid-stream reset leaves (read amplification would
    // grow unbounded in the fresh window)
    val prevWm = math.max(
      ids.filter(_ < 0L).sorted.headOption.map(v => -v - 1L).getOrElse(-1L),
      wmOf(allLedgerIds))
    val dataIds = ids.filter(_ >= 0L).toSet
    val pos = dataIds ++ ledgerIds // empty batches count as present
    var w = prevWm
    while (pos.contains(w + 1L)) w += 1L
    // prune ledger ids a STORED watermark covers — the watermark row
    // subsumes them for [[seen]]. Only ids ≤ the watermark actually
    // landed in the table are safe to drop (the collected ids are
    // driver-local, so the rewrite never reads the table it replaces).
    // DURABLY (r15): the kept set + a watermark tombstone −(covered+1)
    // go to a side table first, the ledger is overwritten FROM the side
    // copy, the side dropped last — a crash in any window leaves at
    // least one complete copy (the r14 plain overwrite could lose a
    // kept id above the watermark, permanently stalling compaction: a
    // committed streaming batch is never re-delivered to re-record it).
    def pruneLedger(covered: Long): Unit =
      if (ledgerIds.exists(_ <= covered)) {
        val keep = ledgerIds.filter(_ > covered).toSeq.sorted
        // fully covered: DROP is atomic, and every dropped id lives on
        // under the main table's stored watermark for [[seen]]
        if (keep.isEmpty) spark.sql(s"DROP TABLE $ledger")
        else {
          import spark.implicits._
          val side = ledgerSide(table)
          (keep :+ -(covered + 1L)).toDF("batch_id")
            .write.mode("overwrite").saveAsTable(side)
          spark.table(side).write.mode("overwrite").saveAsTable(ledger)
          spark.sql(s"DROP TABLE $side")
        }
      }
    // the fold changes the row-set only when un-folded DATA rows sit in
    // the prefix; a watermark advanced purely over ledger (empty-batch)
    // ids must NOT trigger it — folding an empty prefix would write a
    // zero-row set, losing the watermark those ids still need. Skipping
    // also avoids the no-op double-rewrite (and its crash window) when
    // nothing new arrived since the last fold.
    if (w < 0L || !dataIds.exists(_ <= w)) {
      pruneLedger(prevWm) // stale ids from a crash-before-prune
      return (before, before)
    }
    val sums = sumCols.map { c =>
      when(max(col(c).isNull.cast("int")) === 1, lit(null))
        .otherwise(sum(col(c))).cast(schema(c).dataType).as(c)
    }
    val merged = t.filter(col("batch_id") < 0L || col("batch_id") <= w)
      .groupBy(keyCols.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumn("batch_id", lit(-(w + 1L)))
      .select(schema.fieldNames.toSeq.map(col): _*)
    val folded = merged.unionByName(t.filter(col("batch_id") > w))
    // durable side copy FIRST (reads main, writes side — lineage never
    // self-referential), then swap main from the side copy, drop last
    writeLike(spark, folded, side, table)
    writeLike(spark, spark.table(side), table, side)
    spark.sql(s"DROP TABLE $side")
    pruneLedger(w) // the stored watermark now covers these ids
    (before, spark.table(table).count())
  }
}
