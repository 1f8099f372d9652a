package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.etl.VehicleFeed

/** One vehicle observation, typed (streaming state record). */
case class Vehicle(id: String, label: String, latitude: Double, longitude: Double,
                   speed: Double, direction_id: Int, current_status: String,
                   occupancy_status: String, bearing: Int,
                   updated_at: java.sql.Timestamp, obs_id: Long)

/** One per-key change-class emission of the continuous CDC stream
  * (streaming record of [[VehicleStream.cdcPerKey]]). */
case class CdcChange(id: String, change_type: String, obs_id: Long)

/** Structured-Streaming equivalent of the reference's periodic ingest
  * loop (`pipeline.go:63-93 Run()`): instead of poll → transform → SQLite
  * upsert every N seconds, the same dataflow runs continuously as
  * readStream → transform → stateful latest-per-key.
  *
  * Scale notes: the stateful upsert keeps ONE record per vehicle id
  * (bounded state, hash-partitioned by key across executors); windowed
  * aggregation carries a watermark so state for closed windows is
  * dropped, not accumulated forever.
  */
object VehicleStream {

  /** Streaming reads need an explicit schema. `ts` has shipped as
    * TIMESTAMP(NANOS) (a raw long under the session's nanosAsLong conf)
    * and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (TIMESTAMP_NTZ)
    * across testdata generations — mirror of the `Tables.events`
    * normalization. The declared default is the current µs-NTZ shape;
    * [[eventStream]] probes the directory's real footer when one exists
    * and normalizes either shape to a µs instant. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming ingest: parquet file stream → µs timestamps → the same
    * deterministic vehicle derivation the batch path uses (one code
    * path, two execution modes). */
  def ingest(spark: SparkSession, dir: String): DataFrame =
    VehicleFeed.fromEvents(eventStream(spark, dir))

  /** Watermarked tumbling-window counts per current_status. The 2-hour
    * watermark bounds state: windows older than max(event time) − 2h are
    * finalized and evicted. */
  def windowedCounts(vehicles: DataFrame): DataFrame =
    vehicles
      .withWatermark("updated_at", "2 hours")
      .groupBy(window(col("updated_at"), "1 hour"), col("current_status"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("current_status"), col("n"))

  /** Raw normalized event stream (µs instant timestamps) — input for
    * event-level streaming operators. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // NTZ→instant relabel below is only shift-free under UTC (see Tables.events).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = scala.util.Try(spark.read.parquet(dir).schema).toOption
      .filter(_.fieldNames.contains("ts"))
      .getOrElse(eventsSchema)
    val raw = spark.readStream.schema(schema).parquet(dir)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Stream-stream interval join: each purchase ↔ the clicks of the same
    * user within the preceding hour. Watermarks on BOTH sides bound the
    * join state (clicks older than purchase-watermark − 1 h are evicted);
    * the interval condition keeps it an equi-join on user_id with a
    * bounded time range — the streaming analogue of `Temporal.asof`
    * restricted to a window (true "latest only" is not expressible in a
    * stream-stream join; use [[latestPerKey]]-style state for that). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_event_id"), col("value").as("click_value"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_event_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      expr("""c_user = p_user AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR AND
              click_ts <= purchase_ts"""))
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("purchase_event_id"), col("click_ts"), col("click_event_id"),
        col("click_value"))
  }

  /** Streaming exact dedup: drop repeated observations (same obs_id)
    * arriving within the watermark — the streaming counterpart of the
    * batch `Dedup.exactDedup`. State holds one key per obs_id and is
    * evicted once the watermark passes, so it stays bounded no matter
    * how long the stream runs. */
  def dedupedIngest(vehicles: DataFrame): DataFrame =
    vehicles
      .withWatermark("updated_at", "2 hours")
      .dropDuplicatesWithinWatermark("obs_id")

  /** Streaming Load/UPSERT: latest record per vehicle id via
    * `mapGroupsWithState` — the continuous version of the batch argmax
    * upsert (`VehicleFeed.latest`), with the same
    * (updated_at, obs_id) ordering. Emits the winning record per key per
    * micro-batch; state holds exactly one record per key. */
  def latestPerKey(vehicles: DataFrame): Dataset[Vehicle] = {
    val spark = vehicles.sparkSession
    import spark.implicits._
    vehicles.as[Vehicle]
      .groupByKey(_.id)
      .mapGroupsWithState[Vehicle, Vehicle](GroupStateTimeout.NoTimeout) {
        (_: String, obs: Iterator[Vehicle], state: GroupState[Vehicle]) =>
          // getTime is millisecond-truncated; getNanos carries the full
          // fractional second, so this matches the batch upsert's
          // microsecond ordering exactly (same winner for sub-ms ties)
          val latest = (state.getOption.iterator ++ obs)
            .maxBy(v => (v.updated_at.getTime, v.updated_at.getNanos, v.obs_id))
          state.update(latest)
          latest
      }
  }

  /** Continuous funnel metrics — the streaming counterpart of
    * `Funnel.funnel`'s per-stage retention table: per event-time hour,
    * how many observations arrived (`ingested`), survived exact dedup
    * (`unique`), and passed the quality gate (`moving`, speed > 0).
    * This is the monitoring stream a production ingest job alerts on
    * (a dedup-rate spike or quality collapse shows up within one
    * window, not at the end of a batch job).
    *
    * Shape: the raw branch is stateless; the deduped branch runs ONE
    * `dropDuplicatesWithinWatermark` and fans each surviving row into
    * its stage rows with `posexplode` (no second dedup subplan, no
    * self-union of stateful operators), then one watermarked windowed
    * aggregation counts (window, stage). Two stateful operators total,
    * both watermark-bounded — the supported dedup→aggregate chain. */
  def funnelMetrics(vehicles: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val raw = vehicles
      .withWatermark("updated_at", watermarkDelay)
      .select(col("updated_at"), lit(0).as("stage_order"), lit("ingested").as("stage"))
    val staged = dedupedIngest(vehicles)
      .select(col("updated_at"),
        posexplode(when(col("speed") > 0, array(lit("unique"), lit("moving")))
          .otherwise(array(lit("unique")))).as(Seq("off", "stage")))
      .select(col("updated_at"), (col("off") + 1).as("stage_order"), col("stage"))
    raw.unionByName(staged)
      .groupBy(window(col("updated_at"), "1 hour"), col("stage_order"), col("stage"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("stage_order"), col("stage"), col("n"))
  }

  /** Continuous CDC — the streaming form of the batch `v_snapshot_diff`
    * artifact (the reference's load loop IS a stream; its snapshot
    * delta should be too): per micro-batch, every key with arrivals is
    * classified against the upsert state AS OF the previous batch —
    * `added` (no prior state), `changed` (the (updated_at, obs_id)
    * argmax winner moved), `unchanged` (arrivals lost to the retained
    * winner). Keys with no arrivals are trivially unchanged and emit
    * nothing — the standard CDC contract (a change feed carries
    * changes, not the full keyspace per tick; `removed` never fires
    * under append-only upsert but the class is part of the emitted
    * domain for sinks that switch on it).
    *
    * Stream ≡ batch: feeding the cut-half of the feed as batch 1 and
    * the rest as batch 2 makes batch 2's added/changed ID SETS exactly
    * the batch snapshotDiff's classes (StreamingSpec proves set
    * equality, not just counts). State = one record per key (the
    * [[latestPerKey]] bound); per-change-class COUNTS are a stateless
    * foreachBatch aggregate downstream of this stream (stacking a
    * second stateful aggregate over an Update-mode state operator is
    * unsupported by design). */
  def cdcPerKey(vehicles: DataFrame): Dataset[CdcChange] = {
    val spark = vehicles.sparkSession
    import spark.implicits._
    vehicles.as[Vehicle]
      .groupByKey(_.id)
      .flatMapGroupsWithState[Vehicle, CdcChange](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: String, obs: Iterator[Vehicle], state: GroupState[Vehicle]) =>
          val prev = state.getOption
          val latest = (prev.iterator ++ obs)
            .maxBy(v => (v.updated_at.getTime, v.updated_at.getNanos, v.obs_id))
          state.update(latest)
          val changeType = prev match {
            case None => "added"
            case Some(p) if p.obs_id != latest.obs_id => "changed"
            case _ => "unchanged"
          }
          Iterator.single(CdcChange(id, changeType, latest.obs_id))
      }
  }

  /** [[cdcPerKey]] with deletes in the type system — the streaming form
    * of the batch `v_snapshot_diff_tombstone`, completing the CDC
    * contract's `removed` arm (structurally impossible under
    * append-only upsert; reachable once a typed delete record exists —
    * here the feed's tombstone marker, occupancy FEW_SEATS_AVAILABLE
    * ≡ [[graft.queries.VehicleQueries.Tombstone]]).
    *
    * State still holds the (updated_at, obs_id) argmax record per key —
    * INCLUDING a winning tombstone (dropping it would let an older live
    * record resurrect the key on replay, the same reason the batch
    * filter runs after the argmax). Classification is on LIVENESS
    * transitions: dead→live = `added` (first sight or re-registration),
    * live→dead = `removed` (emitted once, with the tombstone's obs_id),
    * live→live = `changed`/`unchanged` by winner movement, dead→dead =
    * no emission (a delete of an absent key is not a change). */
  def cdcPerKeyTombstone(vehicles: DataFrame): Dataset[CdcChange] = {
    val spark = vehicles.sparkSession
    import spark.implicits._
    def live(v: Vehicle): Boolean = v.occupancy_status != "FEW_SEATS_AVAILABLE"
    vehicles.as[Vehicle]
      .groupByKey(_.id)
      .flatMapGroupsWithState[Vehicle, CdcChange](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: String, obs: Iterator[Vehicle], state: GroupState[Vehicle]) =>
          val prev = state.getOption
          val latest = (prev.iterator ++ obs)
            .maxBy(v => (v.updated_at.getTime, v.updated_at.getNanos, v.obs_id))
          state.update(latest)
          val change = (prev.exists(live), live(latest)) match {
            case (false, true)  => Some("added")
            case (true, false)  => Some("removed")
            case (true, true)   =>
              Some(if (prev.get.obs_id != latest.obs_id) "changed" else "unchanged")
            case (false, false) => None
          }
          change.iterator.map(CdcChange(id, _, latest.obs_id))
      }
  }

  /** [[latestPerKey]] with BOUNDED state for unbounded key domains: a
    * key whose last update is older than `ttlMs` of event time is
    * retired — its final record is flushed once more (so a sink can mark
    * it closed) and its state removed. `NoTimeout` is fine for a vehicle
    * fleet (state = fleet size); for generic upsert keys (doc ids, user
    * ids) idle keys would otherwise accumulate for the life of the
    * query, which at 100 TB/day of keys is an unbounded state store.
    *
    * Eviction is driven by `EventTimeTimeout` off the WATERMARK, not
    * wall clock, so replaying the same stream evicts identically
    * (deterministic, like everything else in this engine). The timeout
    * target is `last update + ttlMs`, clamped above the current
    * watermark as the API requires; rows older than the watermark are
    * dropped by the state operator itself (standard late-data rule —
    * `watermarkDelay` is the lateness budget). */
  def latestPerKeyWithTtl(vehicles: DataFrame, ttlMs: Long = 6L * 3600 * 1000,
                          watermarkDelay: String = "2 hours"): Dataset[Vehicle] = {
    val spark = vehicles.sparkSession
    import spark.implicits._
    vehicles
      .withWatermark("updated_at", watermarkDelay)
      .as[Vehicle]
      .groupByKey(_.id)
      .flatMapGroupsWithState[Vehicle, Vehicle](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (_: String, obs: Iterator[Vehicle], state: GroupState[Vehicle]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(last) // retirement flush, then the key is gone
          } else {
            val latest = (state.getOption.iterator ++ obs)
              .maxBy(v => (v.updated_at.getTime, v.updated_at.getNanos, v.obs_id))
            state.update(latest)
            state.setTimeoutTimestamp(
              math.max(latest.updated_at.getTime + ttlMs,
                state.getCurrentWatermarkMs() + 1))
            Iterator.single(latest)
          }
      }
  }
}
