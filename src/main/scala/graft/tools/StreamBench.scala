package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.core.GraftSession
import graft.streaming.VehicleStream

/** Streaming state-store benchmark: replays the sf0.1 events file as N
  * micro-batches through the stateful upsert (`latestPerKey`) and the
  * watermarked window aggregation, reporting per-batch rows/sec and the
  * state-store row count. What this verifies at scale:
  *
  *  - state stays FLAT for the upsert (one row per key, no growth as
  *    batches accumulate — re-delivered keys overwrite);
  *  - throughput stays flat batch-over-batch (no per-batch cost that
  *    grows with total history — the failure mode of unbounded state);
  *  - the windowed aggregation holds only open windows (watermark
  *    eviction), not one row per event ever seen.
  *
  *   sbt "runMain graft.tools.StreamBench 5"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_STATE_STORE=rocksdb benches the provider a real
    // cluster runs (state larger than heap, incremental checkpoints);
    // default is the HDFS-backed in-memory provider
    val provider = sys.env.get("SPARK_GRAFT_STATE_STORE") match {
      case Some("rocksdb") =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case _ =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    }
    val spark = GraftSession.builder("local[8]", "graft-stream-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"state_store":"${provider.split('.').last}"}""")

    def run(label: String, mk: String => org.apache.spark.sql.streaming.DataStreamWriter[_]): Unit = {
      val dir = Files.createTempDirectory(s"graft-sbench-$label").toString
      val q = mk(dir).start()
      val src = Paths.get(sfDir, "events.parquet")
      val perBatch = Seq.newBuilder[(Double, Long)]
      try {
        for (b <- 0 until batches) {
          // stage + atomic move: the running query polls the directory
          // continuously, and a plain multi-MB copy could be listed
          // mid-write (truncated parquet → query failure)
          val tmp = Paths.get(dir, s".batch$b.tmp")
          Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, Paths.get(dir, s"batch$b.parquet"),
            StandardCopyOption.ATOMIC_MOVE)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          val stateRows = q.recentProgress.reverse
            .flatMap(p => p.stateOperators.headOption).headOption
            .map(_.numRowsTotal).getOrElse(-1L)
          perBatch += ((sec, stateRows))
        }
      } finally q.stop()
      val rows = spark.read.parquet(sfDir + "/events.parquet").count()
      val line = perBatch.result().zipWithIndex.map { case ((sec, st), i) =>
        f"""{"batch":$i,"sec":$sec%.2f,"rows_per_sec":${(rows / sec).toLong},"state_rows":$st}"""
      }.mkString("[", ",", "]")
      println(s"""{"bench":"$label","batches":$batches,"rows_per_batch":$rows,"per_batch":$line}""")
    }

    run("latest_per_key", dir =>
      VehicleStream.latestPerKey(VehicleStream.ingest(spark, dir))
        .writeStream.format("noop").outputMode("update"))
    run("windowed_counts", dir =>
      VehicleStream.windowedCounts(VehicleStream.ingest(spark, dir))
        .writeStream.format("noop").outputMode("update"))
    spark.stop()
  }
}
