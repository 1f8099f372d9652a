package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ops.Similarity

/** Streaming ANN index maintenance (SURVEY.md §2.4): keep the
  * hyperplane-LSH signature index fresh as new embeddings arrive,
  * instead of re-indexing the corpus per batch job.
  *
  * The signature is per-row and data-independent (a fixed plane matrix
  * shipped with the plan), so index refresh is a STATELESS streaming
  * projection — no watermark, no state store, scan-speed codegen — and
  * the index table grows strictly by appending. Queries serve off the
  * accumulating table via `Similarity.annLshFromSignatures`: the
  * classic lambda-free split of "continuously indexed, queried on
  * demand". At 100 TB the sink is a bucketed table partitioned by
  * `bucket` (see `core.Store`), so serving probes read only their
  * buckets. Contrast with the IVF index, whose centroids are FITTED:
  * a stream refreshes IVF by re-fitting periodically out-of-band
  * (`Catalog.ivfIndex`), while assignment of arriving vectors is the
  * same stateless projection as here.
  */
object AnnStream {

  /** Streaming reads need an explicit schema (embeddings.parquet). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Raw embedding file stream. */
  def embeddingStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(dir)

  /** Continuously-maintained signature index: one row per arriving
    * vector with its LSH bucket — identical values to the batch
    * `Similarity.withSignatures` (one code path, two execution modes). */
  def signatureStream(embeddings: DataFrame, nPlanes: Int = 8, dim: Int = 64): DataFrame =
    Similarity.withSignatures(embeddings, nPlanes, dim)

  /** Continuously-maintained IVF-PQ code table: each arriving vector is
    * coarse-assigned and residual-encoded against the FITTED index
    * (centroids + codebooks ship with the plan as literals) — a
    * stateless scan projection, so the inverted-file code table grows by
    * appending exactly like the LSH index above. The models themselves
    * are refit out-of-band (`Catalog.ivfPqIndex`; a drifted refit
    * republishes the code table via Store's versioned swap). One code
    * path, two execution modes: values are identical to the batch
    * `Similarity.ivfPqCodes` (spec-proven). */
  def ivfPqCodeStream(embeddings: DataFrame, centroids: Seq[Seq[Double]],
                      books: Seq[Seq[Seq[Double]]]): DataFrame =
    Similarity.ivfPqCodes(embeddings, centroids, books)

  /** Continuously-maintained OPQ code table: each arriving vector is
    * PERMUTED (dim literal GetArrayItem projections — the permutation
    * ships with the plan) and PQ-encoded against the fitted OPQ books —
    * stateless, append-only, exactly like [[ivfPqCodeStream]]; the
    * permutation + books refit out-of-band (`Catalog.opqIndex`). One
    * code path, two execution modes: values identical to the batch
    * OPQ code table the `s_ann_opq` serve scans (spec-proven). */
  def opqCodeStream(embeddings: DataFrame, perm: Seq[Int],
                    books: Seq[Seq[Seq[Double]]]): DataFrame =
    Similarity.pqCodes(Similarity.opqPermute(embeddings, perm), books)
}
