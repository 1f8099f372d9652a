package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft job wants.
  *
  * Local mode is a stand-in for a real cluster: shuffle partitions are
  * pinned to core count (not the 200 default), AQE is on so plans re-split
  * and coalesce at runtime exactly as they would on a 1000-executor
  * cluster, and the session timezone is UTC for oracle parity.
  */
object GraftSession {
  def builder(master: String = "local[*]", appName: String = "graft"): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
