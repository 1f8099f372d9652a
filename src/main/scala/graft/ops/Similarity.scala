package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions

/** Similarity search over an embedding column (SURVEY.md §2.3).
  *
  * Two paths:
  *  - [[annTopK]] — brute-force cosine top-k against a broadcast query
  *    vector. The correctness baseline: one scan, cosine inside
  *    WholeStageCodegen (`graft_cosine`), `TakeOrderedAndProject` for the
  *    top-k (per-partition heaps, no global sort). At 100 TB this is the
  *    plan you run when you genuinely must rank everything.
  *  - [[annLsh]] — the scale path: random-hyperplane signatures bucket
  *    the corpus; the query probes its own bucket plus all buckets within
  *    hamming 1 (multi-probe), as an equi-join on the bucket id. Scan
  *    cost is unchanged (signatures are scan-side), but ranking touches
  *    only the probed buckets — ~(1+P)/2^P of the corpus for P planes.
  */
object Similarity {

  /** Deterministic hyperplanes: fixed-seed Gaussian components, shipped
    * as a literal (broadcast with the plan, never shuffled). */
  private def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Brute-force cosine top-k vs the embedding of `queryVecId`. */
  def annTopK(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 20): DataFrame = {
    val q = broadcast(embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding")))
    embeddings
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .withColumn("cos", GraftFunctions.cosine(col("embedding"), col("q_embedding")))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Random-hyperplane LSH ANN: `nPlanes` sign bits form the bucket id;
    * candidates come from an equi-join of the corpus's bucket id against
    * the query's multi-probe bucket set (own bucket + hamming-1
    * neighbors); top-k by exact cosine among candidates only. */
  def annLsh(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10,
             nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    // bucket = Σ_p (dot(embedding, planes[p]) > 0) << p — scan-side via the
    // codegen'd graft_hyperplane_sig expression (the literal plane matrix
    // ships with the plan; no shuffle, no interpreted lambda per element)
    val planesCol = typedlit(hyperplanes(nPlanes, dim))
    val withSig = embeddings
      .withColumn("bucket", GraftFunctions.hyperplaneSig(col("embedding"), planesCol))
      .select(col("vec_id"), col("label"), col("embedding"), col("bucket"))
    // multi-probe set: the query bucket and every 1-bit flip of it
    val probes = withSig.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"),
        explode(concat(array(col("bucket")),
          expr(s"transform(sequence(0, ${nPlanes - 1}), p -> bucket ^ shiftleft(1L, p))")))
          .as("probe"))
    withSig
      .join(broadcast(probes), col("bucket") === col("probe") && col("vec_id") =!= queryVecId)
      .withColumn("cos", GraftFunctions.cosine(col("embedding"), col("q_embedding")))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("bucket"), round(col("cos"), 4).as("cos_sim"))
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_ann_topk" -> ((s, d) => annTopK(Tables(s, d).embeddings)),
    "s_ann_lsh"  -> ((s, d) => annLsh(Tables(s, d).embeddings)))

  /** s_ann_lsh is rows-checked (buckets depend on JVM-side hyperplane
    * literals); its semantics are spec-tested against annTopK. */
  val oracles: Map[String, String] = Map(
    "s_ann_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id, e.label,
        |  list_sum(list_transform(list_zip(e.embedding, q.qe),
        |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
        |  sqrt(list_sum(list_transform(e.embedding,
        |    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS na,
        |  sqrt(list_sum(list_transform(q.qe,
        |    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nb
        |  FROM embeddings e, q WHERE e.vec_id != 0)
        |SELECT vec_id, label,
        |  ROUND(CASE WHEN na * nb = 0 THEN 0 ELSE dot / (na * nb) END, 4) AS cos_sim
        |FROM s
        |ORDER BY (CASE WHEN na * nb = 0 THEN 0 ELSE dot / (na * nb) END) DESC, vec_id ASC
        |LIMIT 20""".stripMargin)
}
