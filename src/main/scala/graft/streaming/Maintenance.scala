package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ONE idempotent scheduled maintenance entry point (r14) — the
  * composition the specs previously proved only piecewise: the WAL
  * partials compactions (the five durable-partials maintainers), the
  * Store small-files compactions, and the ANN refit recommendation
  * (drift ∨ volume) run as a single [[tick]], each action appending
  * one DECISION-LOG row `(tick_id, action, target, before, after,
  * acted)`. The operational story stops being assembled by the caller:
  *
  *  - IDEMPOTENT: a crash-replayed tick (same `tick_id`) is skipped
  *    whole and its logged rows returned — every underlying action is
  *    individually durable and crash-safe (the Wal side-copy swap, the
  *    Store versioned publish), so the log row is the tick's replay
  *    guard exactly like a maintainer's `batch_id`.
  *  - NO-OP WHEN QUIET: nothing new since the last tick ⇒ the Wal
  *    fold early-returns (r14 — no rewrite), Store tables already at
  *    one-file-per-bucket are skipped by the [[graft.core.Store
  *    .dataFileCount]] guard, and the log records `acted = false`
  *    rows — a scheduled tick on a quiet system burns no table
  *    rewrite (spec-proven by part-file identity).
  *  - The refit leg only RECOMMENDS (`acted` = the drift ∨ volume
  *    recommendation, [[AnnStream.refitRecommended]]): executing the
  *    rebuild + swap (`Store.publishAnnRefit`) is the scheduled
  *    consumer's decision — the heavy rebuild must not ride an
  *    otherwise-cheap tick, and the log row IS the signal it reads.
  *
  * `acted` semantics per action: `wal_compact` — the fold changed the
  * row-set (before ≠ after; a fold that merges nothing reports
  * false even though the watermark advanced — the next tick's
  * early-return makes that distinction moot); `store_compact` — a
  * rewrite ran; `refit_check` — a refit is recommended. Scale shape:
  * the tick's own cost is the sum of its parts, each already bounded
  * (fold ≤ keys + batch rows, store rewrite ∝ one table, refit check
  * over model-scale snapshots) — the log append is ≤ #jobs rows. */
object Maintenance {

  /** A WAL-partials compaction leg: the maintainer's own compact
    * (e.g. `s => MixStream.compact(s, table)` — each maintainer knows
    * its key/sum columns and upgrade rules).
    *
    * CONTRACT: `compact` MUST be a safe no-op on a fully ABSENT table
    * (return (0, 0) rather than throw). [[tick]] calls every WalJob
    * unconditionally — deliberately, since r15: a crash can leave only
    * the `<table>__wal_fold` side copy with the main table missing,
    * and gating on tableExists would skip that state's recovery
    * forever. Every `Wal.compactPartials`-backed compact satisfies
    * this already; a custom implementation that probes the table
    * un-guarded would throw the whole tick. */
  final case class WalJob(table: String, compact: SparkSession => (Long, Long))

  /** A Store small-files compaction leg ([[graft.core.Store.compact]]),
    * guarded by the file count: skipped when already ≤ one file per
    * bucket. */
  final case class StoreJob(table: String, key: String, buckets: Int = 8)

  /** The ANN refit recommendation inputs
    * ([[AnnStream.refitRecommended]]: drift of arrivals vs the
    * fit-time snapshot ∨ delete-volume vs the list-size snapshot). */
  final case class RefitJob(arrived: DataFrame, fitSnap: DataFrame,
                            listSnap: DataFrame, countersTable: String,
                            minCos: Double = 0.98, minLiveFrac: Double = 0.5)

  /** The TEXT-model staleness check ([[ModelStream.refitRecommended]]:
    * feature-distribution cosine of arrivals vs the fit-time snapshot
    * ∨ unseen-bucket mass) — the [[RefitJob]] discipline for the DSIR
    * and quality-classifier serving artifacts. Logged as action
    * `text_refit_check`; like the ANN leg the tick only RECORDS the
    * recommendation — re-fitting and publishing the artifact stays
    * the consumer's scheduled move. */
  final case class TextRefitJob(fitSnap: DataFrame, countersTable: String,
                                minCos: Double = 0.98,
                                maxUnseenFrac: Double = 0.05)

  /** A Store version-GC leg (r16): every snapshot-safe swap
    * (`Takedown.scrub`, `Store.publishAnnRefit`,
    * `IngestGate.compactDecisions`, any `publishLike`) RETAINS the
    * previous backing version for in-flight readers — reclamation is
    * deliberately deferred to the maintenance schedule, and this leg
    * is that schedule: `Store.vacuum(table, keepVersions)` per tick,
    * logged as action `vacuum` with before/after = live version
    * counts and acted = something was actually dropped. Safe no-op on
    * plain or missing tables (Store.vacuum returns empty). */
  final case class VacuumJob(table: String, keepVersions: Int = 2)

  val LogTable = "graft_maintenance_log"

  private val logSchema = StructType(Seq(
    StructField("tick_id", LongType), StructField("action", StringType),
    StructField("target", StringType), StructField("before", LongType),
    StructField("after", LongType), StructField("acted", BooleanType)))

  /** Has `tickId` already run against `logTable`? (The tick replay
    * guard — same shape as [[Wal.seen]].) */
  def seen(spark: SparkSession, logTable: String, tickId: Long): Boolean =
    spark.catalog.tableExists(logTable) &&
      !spark.table(logTable).filter(col("tick_id") === tickId).limit(1).isEmpty

  /** Run one maintenance tick; returns the tick's decision-log rows
    * (also durably appended to `logTable`). A replayed `tickId`
    * re-runs NOTHING and returns the original rows. */
  def tick(spark: SparkSession, tickId: Long,
           wal: Seq[WalJob] = Seq.empty,
           store: Seq[StoreJob] = Seq.empty,
           refit: Option[RefitJob] = None,
           vacuum: Seq[VacuumJob] = Seq.empty,
           textRefit: Option[TextRefitJob] = None,
           logTable: String = LogTable): DataFrame = {
    def logged: DataFrame =
      spark.table(logTable).filter(col("tick_id") === tickId)
    if (seen(spark, logTable, tickId)) return logged
    val rows = Seq.newBuilder[Row]
    wal.foreach { j =>
      // no existence guard (r15): Wal.compactPartials' own crash
      // recovery exists precisely for the state where a mid-swap crash
      // left only the <table>__wal_fold side copy and the main table
      // missing — gating on tableExists(j.table) would skip that
      // recovery forever. compactPartials is a safe (0, 0) no-op on a
      // fully absent table.
      val (b, a) = j.compact(spark)
      rows += Row(tickId, "wal_compact", j.table, b, a, b != a)
    }
    store.foreach { j =>
      if (spark.catalog.tableExists(j.table)) {
        val files = graft.core.Store.dataFileCount(spark, j.table)
        if (files > j.buckets) {
          val (b, a) = graft.core.Store.compact(spark, j.table, j.key, j.buckets)
          rows += Row(tickId, "store_compact", j.table, b, a, true)
        } else rows += Row(tickId, "store_compact", j.table, files, files, false)
      } else rows += Row(tickId, "store_compact", j.table, 0L, 0L, false)
    }
    refit.foreach { r =>
      val rec = AnnStream.refitRecommended(spark, r.arrived, r.fitSnap,
        r.listSnap, r.countersTable, r.minCos, r.minLiveFrac)
      rows += Row(tickId, "refit_check", r.countersTable, 0L, 0L, rec)
    }
    vacuum.foreach { j =>
      val droppedN = graft.core.Store.vacuum(spark, j.table, j.keepVersions).size.toLong
      val remaining = graft.core.Store.versions(spark, j.table).size.toLong
      rows += Row(tickId, "vacuum", j.table, droppedN + remaining, remaining,
        droppedN > 0L)
    }
    textRefit.foreach { r =>
      val rec = ModelStream.refitRecommended(spark, r.fitSnap,
        r.countersTable, r.minCos, r.maxUnseenFrac)
      rows += Row(tickId, "text_refit_check", r.countersTable, 0L, 0L, rec)
    }
    // the log rows are driver-local decisions (≤ #jobs) — model-scale
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), 1), logSchema)
    df.write.mode("append").saveAsTable(logTable)
    logged
  }

  /** Bind [[tick]] to the scheduler a Spark deployment actually has:
    * a 1-row-per-trigger rate stream whose CHECKPOINTED micro-batch id
    * is the tick_id — a restarted scheduler resumes its id sequence
    * from the checkpoint, and the tick's own replay guard makes any
    * re-fired id a no-op, so the schedule is crash-safe end to end
    * with no state beyond the log table and the checkpoint dir. */
  def start(spark: SparkSession, intervalSec: Int, checkpointDir: String,
            wal: Seq[WalJob] = Seq.empty,
            store: Seq[StoreJob] = Seq.empty,
            refit: Option[RefitJob] = None,
            vacuum: Seq[VacuumJob] = Seq.empty,
            textRefit: Option[TextRefitJob] = None,
            logTable: String = LogTable): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate")
      .option("rowsPerSecond", 1).option("numPartitions", 1).load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"$intervalSec seconds"))
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        tick(spark, batchId, wal, store, refit, vacuum, textRefit, logTable); ()
      }
      .start()
}
