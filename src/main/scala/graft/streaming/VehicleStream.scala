package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

import graft.etl.VehicleFeed

/** One vehicle observation, typed (streaming state record). */
case class Vehicle(id: String, label: String, latitude: Double, longitude: Double,
                   speed: Double, direction_id: Int, current_status: String,
                   occupancy_status: String, bearing: Int,
                   updated_at: java.sql.Timestamp, obs_id: Long)

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

  /** Streaming reads need an explicit schema. Under the session's
    * nanosAsLong conf (GraftSession), the TIMESTAMP(NANOS) `ts` column
    * arrives as a raw nanosecond long — declared as such here, then
    * normalized to a µs timestamp in [[ingest]]. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming ingest: parquet file stream → µs timestamps → the same
    * deterministic vehicle derivation the batch path uses (one code
    * path, two execution modes). */
  def ingest(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    VehicleFeed.fromEvents(raw)
  }

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
          val latest = (state.getOption.iterator ++ obs)
            .maxBy(v => (v.updated_at.getTime, v.obs_id))
          state.update(latest)
          latest
      }
  }
}
