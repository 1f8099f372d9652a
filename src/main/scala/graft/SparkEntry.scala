package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.VehicleFeed
import graft.queries.{AnalyticsQueries, VehicleQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full ETL (derive → upsert) → top-10 fastest. */
  def entry(spark: SparkSession): DataFrame =
    VehicleQueries.topFastest(
      VehicleFeed.vehiclesFromEvents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VehicleQueries.queries ++ AnalyticsQueries.queries ++
      graft.ops.Dedup.queries ++ graft.ops.UrlDedup.queries ++
      graft.ops.DupClusters.queries ++
      graft.ops.Funnel.queries ++ graft.ops.Similarity.queries ++
      graft.ops.TextAnalysis.queries ++ graft.ops.Packing.queries ++
      graft.ops.Multimodal.queries ++ graft.ops.Skew.queries ++
      graft.ops.Profiler.queries ++ graft.ops.Sampling.queries ++
      graft.ops.Search.queries ++ graft.ops.DomainGraph.queries

  /** DuckDB-equivalent SQL per query key (column names aligned). */
  def oracleSql: Map[String, String] =
    VehicleQueries.oracles ++ AnalyticsQueries.oracles ++
      graft.ops.Dedup.oracles ++ graft.ops.UrlDedup.oracles ++
      graft.ops.DupClusters.oracles ++
      graft.ops.Funnel.oracles ++ graft.ops.Similarity.oracles ++
      graft.ops.TextAnalysis.oracles ++ graft.ops.Packing.oracles ++
      graft.ops.Multimodal.oracles ++ graft.ops.Skew.oracles ++
      graft.ops.Profiler.oracles ++ graft.ops.Sampling.oracles ++
      graft.ops.Search.oracles ++ graft.ops.DomainGraph.oracles
}
