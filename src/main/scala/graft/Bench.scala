package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Benchmark entry: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line `{"metric":"total","value":…,"queries":{…},…}`.
  *
  * The session comes from `GraftSession.builder` so benched plans are the
  * shipped plans (AQE, UTC, pinned shuffle partitions, graft functions).
  * A failed query is reported in an `errors` list and makes the process
  * exit non-zero — it is never silently folded into a fast wall-time.
  *
  * Each query is timed `SPARK_GRAFT_BENCH_REPS` times (default 3) within
  * the one JVM and reports its MEDIAN: a single-pass bench lets one
  * GC/JIT hiccup land on whichever key happens to be running (round 2's
  * driver run charged a 24 s stall to a 2 s hash aggregate) — the
  * per-query median absorbs any one-off stall while still counting every
  * real plan cost. `value` is the sum of per-query medians.
  */
object Bench {
  /** Idle-box warm_fits_sec ceiling at the contract config (sf0.1,
    * local[32]): every recorded idle run reads 16–49 s (BASELINE.md r10/r11
    * rows); the r11 driver battery's 216 s was a 12× load artifact that
    * cost 31 spurious per-key flags. A reading past 2× this ceiling makes
    * the battery self-flag as load-contaminated so its per-key >2× flags
    * are adjudicated (fresh JVM, idle box) instead of believed. */
  val IdleWarmFitsMaxSec = 50.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]", "graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 1-min system load average at battery start (−1.0 where the JVM
    // can't read it) — recorded so a loaded-box battery is
    // self-interpreting instead of costing a round of adjudication
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()

    // Warm the shared upserted-vehicles frame (and the JVM/codegen paths)
    // so per-query timings measure the query, not 13× the same ETL; also
    // touch every base table once so OS/page-cache and parquet footer
    // reads don't land on whichever query sorts first alphabetically.
    graft.core.Catalog.vehicles(spark, sfDir).count()
    val t = graft.core.Tables(spark, sfDir)
    Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
      t.lineitem, t.documents, t.embeddings).foreach(_.count())
    // Make the shared-fit warm-up EXPLICIT (BASELINE.json's declared
    // "warm Catalog" config): whichever fit-family key happened to run
    // first used to pay the one-time Lloyd/PQ/signature/CC build, so
    // battery flags tracked key ORDER instead of plan changes (the r9
    // s_hybrid_rrf / s_hard_negatives / s_kmeans adjudications). The
    // builds are timed and reported as their own `warm_fits_sec` JSON
    // field — visible, never folded into (or hidden from) a per-key
    // median.
    val tw0 = System.nanoTime()
    graft.core.Catalog.minhashSignatures(spark, sfDir).count()
    graft.core.Catalog.docFingerprints(spark, sfDir).count()
    graft.core.Catalog.dupClusters(spark, sfDir).count()
    graft.core.Catalog.ivfIndex(spark, sfDir)._2.count()
    graft.core.Catalog.pqIndex(spark, sfDir)._2.count()
    // the m-sweep's off-m codebooks (m=8 aliases pqIndex above) — in
    // the warm block for the same reason as bpeModelSnapshot: a
    // reps=1 per-key adjudication must time s_pq_curve's SERVE, not
    // its one-per-session fits
    graft.core.Catalog.pqCurveBooks(spark, sfDir, 2)
    graft.core.Catalog.pqCurveBooks(spark, sfDir, 4)
    graft.core.Catalog.ivfPqIndex(spark, sfDir)._3.count()
    graft.core.Catalog.opqIndex(spark, sfDir)._3.count()
    graft.core.Catalog.evalNgramBloom(spark, sfDir)
    graft.core.Catalog.semanticSurvivors(spark, sfDir).count()
    graft.core.Catalog.bpeModel(spark, sfDir)._2.count()
    // the compression-curve scalars ride their own training run — in
    // the warm block for the reps=1-adjudication reason (bpeModelSnapshot)
    graft.core.Catalog.bpeCurve(spark, sfDir)
    graft.core.Catalog.bpeModelSnapshot(spark, sfDir)._2.count()
    graft.core.Catalog.rankSnapshot(spark, sfDir).count()
    val warmFitsSec = (System.nanoTime() - tw0) / 1e9

    // Optional comma-separated key filter (reproduce-protocol tooling:
    // time one key in a fresh JVM without the 97-key battery context).
    // Unset = the full battery, the driver contract.
    val only = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var errors = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = Seq.newBuilder[Double]
      var failed = false
      var rep = 0
      while (rep < reps && !failed) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            errors ::= name
            failed = true
        }
        rep += 1
      }
      // a failed key reports -1, never its abort latency — the timing
      // payload stays honest even though the process exits non-zero
      val sorted = times.result().sorted
      name -> (if (failed) -1.0 else sorted(sorted.size / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // failed keys (-1 sentinel) are excluded from the headline total —
    // a failure must never make the total look faster
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Load self-defense: the warm-fits block is a FIXED workload, so its
    // elapsed ratio against the documented idle ceiling is a built-in
    // load probe for the very machine and very JVM that produced the
    // per-key numbers. Only meaningful on the full battery at the
    // contract SF (a key-filtered or off-SF run skips/changes the warm
    // block's cost profile).
    val loadEnd = loadAvg()
    val fullBattery = only.isEmpty && sfDir.endsWith("0.1")
    val underLoad = fullBattery && warmFitsSec > 2.0 * IdleWarmFitsMaxSec
    if (underLoad)
      System.err.println(
        f"[bench] BATTERY_UNDER_LOAD: warm_fits_sec $warmFitsSec%.1f exceeds 2x the " +
        f"idle ceiling ($IdleWarmFitsMaxSec%.0f s; idle runs read 16-49 s) — load avg " +
        f"$loadStart%.2f -> $loadEnd%.2f. Per-key >2x readings from this run are load " +
        "artifacts until reproduced per the fresh-JVM idle protocol (BASELINE.md).")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"reps":$reps,"warm_fits_sec":$warmFitsSec,"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"idle_warm_fits_max_sec":$IdleWarmFitsMaxSec,"battery_under_load":$underLoad,"sf":"$sfDir"}"""
    println(json)
    // The stdout line is the driver contract, but log pipelines truncate
    // (r4's per-query map survived only in a cut-off tail) — also land
    // the artifact in a file so the full JSON is always recoverable.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
