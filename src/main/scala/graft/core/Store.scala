package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable form of "the loaded table" — the Spark-native equivalent of
  * the reference's persisted SQLite table + indexes
  * (pipeline.go:41-58 creates `vehicles` with indexes on `updated_at`
  * and `label`; every later query reads that table, not the feed).
  *
  * The Spark analogue of a btree index on the join/grouping key is a
  * BUCKETED, SORTED parquet table: `bucketBy(n, key)` pre-partitions the
  * data by hash(key) at write time, so later joins/aggregations on that
  * key read co-located buckets and skip the shuffle entirely
  * (`Bucketed: true`, zero Exchange below the join — proven in
  * ScaleOpsSpec and StoreSpec). `sortBy(key)` gives sort-merge-ready
  * runs within each bucket. At 100 TB this is the difference between an
  * upsert+query pipeline that shuffles the corpus once per query and
  * one that shuffles it once per LOAD.
  *
  * Reads go through [[vehicles]] / [[minhashSignatures]], which prefer
  * the stored table when it exists and fall back to deriving in-session
  * (the Catalog cache) when it doesn't — so queries are oblivious to
  * whether the load has been made durable yet.
  */
object Store {

  val VehiclesTable = "graft_vehicles"
  val SignaturesTable = "graft_minhash_sigs"
  val ClustersTable = "graft_dup_clusters"

  /** Persist the upserted vehicles as a bucketed+sorted table keyed by
    * vehicle id (the reference's PRIMARY KEY). Bucket count is a layout
    * choice: ~(table size / target file size) on a cluster. */
  def saveVehicles(spark: SparkSession, dir: String, buckets: Int = 8,
                   table: String = VehiclesTable): Unit =
    Catalog.vehicles(spark, dir).write
      .mode("overwrite")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(table)

  /** Persist the MinHash signature table bucketed by doc_id — the
    * materialized signature table SCALING.md documents (≈1% of corpus
    * bytes; amortizes signature computation across dedup runs, and
    * candidate verification joins back to it shuffle-free). */
  def saveMinhashSignatures(spark: SparkSession, dir: String, buckets: Int = 8,
                            table: String = SignaturesTable): Unit =
    Catalog.minhashSignatures(spark, dir).write
      .mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(table)

  /** Incrementally extend a stored signature table: compute signatures
    * ONLY for documents not yet present and append them (the bucketed
    * layout is preserved — Spark validates the bucket spec on append).
    * At 100 TB this is the difference between re-shingling the whole
    * corpus per ingest batch and paying compute proportional to NEW
    * documents only; the anti-join driving it reads just the stored
    * table's doc_id column (pruned scan). Idempotent: a re-run with the
    * same corpus appends nothing. */
  def refreshMinhashSignatures(spark: SparkSession, documents: org.apache.spark.sql.DataFrame,
                               buckets: Int = 8, table: String = SignaturesTable): Long = {
    import org.apache.spark.sql.functions.col
    if (!spark.catalog.tableExists(table)) {
      graft.ops.Dedup.minhashSignatures(documents).write
        .mode("overwrite").bucketBy(buckets, "doc_id").sortBy("doc_id")
        .saveAsTable(table)
      spark.table(table).count()
    } else {
      val known = spark.table(table).select(col("doc_id"))
      // STAGE the delta to a scratch path before appending: the delta's
      // plan reads the table being appended to, so any re-evaluation
      // after rows land — cache eviction, task retry — would see its own
      // output and silently drop/duplicate signatures. A parquet stage
      // is a real materialization (unlike best-effort persist or
      // localCheckpoint blocks, which also have no deterministic
      // cleanup). The stage lives NEXT TO the warehouse — i.e. on the
      // same cluster-visible filesystem executors commit to — never in
      // a driver-local temp dir, and is deleted through the Hadoop FS
      // API on the way out.
      val stage = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        s"/_graft_sig_delta_${java.util.UUID.randomUUID}"
      try {
        graft.ops.Dedup.minhashSignatures(
          documents.join(known, Seq("doc_id"), "left_anti"))
          .write.mode("overwrite").parquet(stage)
        val delta = spark.read.parquet(stage)
        val n = delta.count()
        if (n > 0)
          delta.write.mode("append").bucketBy(buckets, "doc_id").sortBy("doc_id")
            .saveAsTable(table)
        n
      } finally {
        val p = new org.apache.hadoop.fs.Path(stage)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  /** Persist the duplicate-cluster assignment (doc_id → cluster_id)
    * bucketed by doc_id — the durable "cluster map" every downstream
    * keep/drop decision joins against. Survivor filtering and funnel
    * stages key on doc_id, so the bucketed layout makes those semi-joins
    * read pre-partitioned buckets. */
  def saveDupClusters(spark: SparkSession, dir: String, buckets: Int = 8,
                      table: String = ClustersTable): Unit =
    Catalog.dupClusters(spark, dir).write
      .mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(table)

  /** Incrementally refresh a stored cluster map with a new batch's
    * near-dup pairs: the stored assignment re-enters as its star edges
    * (already the algorithm's fixpoint shape — see
    * `DupClusters.refresh`), so historical PAIRS are never recomputed;
    * only the new edges perturb the stars. Unlike the signature table
    * this REWRITES (cluster roots can change when components merge), so
    * the result is staged to a cluster-visible scratch path before the
    * overwrite — the new map's plan reads the table it replaces. */
  def refreshDupClusters(spark: SparkSession, vertices: DataFrame, newPairs: DataFrame,
                         buckets: Int = 8, table: String = ClustersTable): Unit = {
    if (!spark.catalog.tableExists(table)) {
      graft.ops.DupClusters.connectedComponents(newPairs, vertices).write
        .mode("overwrite").bucketBy(buckets, "doc_id").sortBy("doc_id")
        .saveAsTable(table)
    } else {
      val stage = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        s"/_graft_cc_delta_${java.util.UUID.randomUUID}"
      try {
        graft.ops.DupClusters.refresh(spark.table(table), newPairs, vertices)
          .write.mode("overwrite").parquet(stage)
        spark.read.parquet(stage).write
          .mode("overwrite").bucketBy(buckets, "doc_id").sortBy("doc_id")
          .saveAsTable(table)
      } finally {
        val p = new org.apache.hadoop.fs.Path(stage)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  /** Compact a stored bucketed table back to ONE file per bucket.
    *
    * Every incremental [[refreshMinhashSignatures]] append lands one
    * file-set per batch, so bucket b accumulates one file per refresh —
    * the classic small-files decay of any append-only table (the
    * Delta/Iceberg OPTIMIZE problem). `repartition(buckets, key)` uses
    * the same murmur3-hash partitioning as the bucket spec, so each
    * write task holds exactly one bucket's rows and emits exactly one
    * file; the rewrite changes the LAYOUT only — contents and the
    * exchange-free join property are preserved (spec-proven). Contents
    * are staged to a cluster-visible scratch path first because the
    * rewrite's plan reads the table it replaces.
    *
    * Returns (files before, files after). Run it when
    * files-per-bucket × open cost starts to show in scan times — at
    * 100 TB that is a scheduled maintenance job, exactly like SQLite's
    * VACUUM for the reference's store. */
  def compact(spark: SparkSession, table: String, key: String,
              buckets: Int = 8): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    def dataFiles(): Long = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
          "/" + table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(loc)) 0L
      else fs.listStatus(loc).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    }
    val before = dataFiles()
    val stage = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      s"/_graft_compact_${java.util.UUID.randomUUID}"
    try {
      spark.table(table).write.mode("overwrite").parquet(stage)
      spark.read.parquet(stage)
        .repartition(buckets, col(key))
        .write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)
    } finally {
      val p = new org.apache.hadoop.fs.Path(stage)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    (before, dataFiles())
  }

  /** The cluster map: stored if present, else in-session. */
  def dupClusters(spark: SparkSession, dir: String,
                  table: String = ClustersTable): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else Catalog.dupClusters(spark, dir)

  /** The loaded vehicles: the stored table if one exists, else the
    * in-session derived+cached frame. */
  def vehicles(spark: SparkSession, dir: String, table: String = VehiclesTable): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else Catalog.vehicles(spark, dir)

  /** The signature table: stored if present, else in-session. */
  def minhashSignatures(spark: SparkSession, dir: String,
                        table: String = SignaturesTable): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else Catalog.minhashSignatures(spark, dir)
}
