package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** One media observation: opaque bytes + typed metadata. The `bytes`
  * column is genuine `binary` — at 100 TB this is the column layout for
  * image/audio/video payloads (parquet keeps it unencoded per-row-group;
  * column pruning means metadata-only queries never read it). */
case class MediaRecord(doc_id: Long, media_type: String, width: Int, height: Int, bytes: Array[Byte])

/** Decoder output: per-item features, no raw bytes (so downstream aggs
  * never carry the payload). */
case class DecodedMedia(doc_id: Long, media_type: String, width: Int, height: Int,
                        n_bytes: Int, content_md5: String, feature: Long)

/** Multimodal column plumbing (SURVEY.md §2.3 `m_multimodal`).
  *
  * The pipeline shape is the real thing; only the innermost decode is a
  * STUB. Structure:
  *  1. [[assemble]] — columnar: build the binary payload + typed metadata
  *    (media_type/width/height) in one codegen'd projection. In
  *    production this is the parquet scan of a media table.
  *  2. [[decode]] — the typed seam: `Dataset[MediaRecord] → map →
  *    Dataset[DecodedMedia]`. A real decoder (JPEG/audio frames) is a
  *    native-library call per record, exactly what this per-partition
  *    typed map (or `mapInArrow`/`mapInPandas` in PySpark) is for; the
  *    batch shape, schema and partitioning here are what production
  *    would use. The stub derives deterministic features from the bytes
  *    so the whole pipeline is oracle-checkable.
  *  3. Downstream: plain columnar aggregation over the decoded features.
  *
  * Scale notes: decode parallelism = input partitions (repartition before
  * decoding if row groups are few); features drop the payload so the
  * post-decode shuffle carries ~100 bytes/row, not the media.
  */
object Multimodal {

  /** STUB decoder — deterministic stand-in for an image/audio decode
    * (real codec libraries are not available in this environment). Keeps
    * the signature and cost model of a real per-record decode. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(r.bytes).map("%02x".format(_)).mkString
    DecodedMedia(r.doc_id, r.media_type, r.width, r.height,
      r.bytes.length, hex, (r.bytes.length.toLong * 31L + r.doc_id) % 997L)
  }

  /** Columnar assembly of the media table from `documents` (testdata
    * stand-in: the payload is the UTF-8 text; metadata derives
    * deterministically from doc_id). */
  def assemble(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      (lit(64) + col("doc_id") % 512).cast("int").as("width"),
      (lit(64) + (col("doc_id") * 7) % 512).cast("int").as("height"),
      // null text → empty payload, so the typed decode never sees null bytes
      encode(coalesce(col("text"), lit("")), "UTF-8").as("bytes")
    ).as[MediaRecord]
  }

  /** The typed decode stage (see class doc: the seam where a real codec
    * plugs in; stubbed, deterministic).
    *
    * `parallelism`: decode runs one task per input partition; a media
    * table often arrives in few large row groups while decode is
    * CPU-bound, so allow an explicit fan-out before the map (round-robin
    * — no key needed, decode is per-record). */
  def decode(media: Dataset[MediaRecord], parallelism: Option[Int] = None): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    val spread = parallelism.map(media.repartition(_)).getOrElse(media)
    spread.map(decodeStub _)
  }

  /** Full pipeline: assemble → decode → feature frame. */
  def pipeline(documents: DataFrame): DataFrame =
    decode(assemble(documents)).toDF()

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_multimodal" -> ((s, d) => pipeline(Tables(s, d).documents)))

  val oracles: Map[String, String] = Map(
    "m_multimodal" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  CAST(64 + doc_id % 512 AS INTEGER) AS width,
        |  CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS height,
        |  CAST(octet_length(encode(COALESCE(text, ''))) AS INTEGER) AS n_bytes,
        |  md5(COALESCE(text, '')) AS content_md5,
        |  (octet_length(encode(COALESCE(text, ''))) * 31 + doc_id) % 997 AS feature
        |FROM documents""".stripMargin)
}
