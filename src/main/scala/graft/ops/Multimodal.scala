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

/** One sampled frame: payload chunk + position, no full media. */
case class MediaFrame(doc_id: Long, frame_index: Int, n_bytes: Int, frame_md5: String)

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

  /** STUB resize at the same typed seam as [[decodeStub]]: metadata set
    * to the target box, payload deterministically downsampled to
    * `ceil(n · targetArea/origArea)` bytes (capped at n) — the cost
    * model of a real resize (output bytes ∝ target area; a real impl is
    * a libvips/ffmpeg call per record here). Payload-shrinking BEFORE
    * any shuffle is the point at 100 TB: downstream stages carry the
    * thumbnail, never the original. */
  def resizeStub(r: MediaRecord, tw: Int, th: Int): MediaRecord = {
    val origArea = r.width.toLong * r.height
    val targetArea = tw.toLong * th
    val n =
      if (origArea <= 0) 0
      else math.min(r.bytes.length.toLong,
        (r.bytes.length.toLong * targetArea + origArea - 1) / origArea).toInt
    MediaRecord(r.doc_id, r.media_type, tw, th, java.util.Arrays.copyOf(r.bytes, n))
  }

  /** Typed resize stage: one map per record (same parallelism story as
    * [[decode]]). */
  def resize(media: Dataset[MediaRecord], tw: Int = 64, th: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(resizeStub(_, tw, th))
  }

  /** Frame sampling: split the payload into `frameSize`-byte frames and
    * keep every `every`-th one (a video keyframe sampler's shape: output
    * rows ∝ media length / (frameSize · every), each row carries one
    * frame, never the whole payload). flatMap at the typed seam — a real
    * impl demuxes with a codec here; the deterministic chunking keeps it
    * oracle-checkable. */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int = 256,
                   every: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = r.bytes.length
      val frames = (n + frameSize - 1) / frameSize
      val md = MessageDigest.getInstance("MD5") // one digest per record, reset per frame
      (0 until frames by every).map { i =>
        val from = i * frameSize
        val until = math.min(n, from + frameSize)
        md.reset()
        md.update(r.bytes, from, until - from)
        val hex = md.digest().map("%02x".format(_)).mkString
        MediaFrame(r.doc_id, i, until - from, hex)
      }
    }
  }

  /** Media-payload exact dedup: group on the decoded frame's
    * content_md5 — byte-identical media collapse to one group with a
    * min-doc_id keeper, the first stage of any multimodal dedup (the
    * embedding/perceptual near-dup stages compose downstream exactly
    * like the text family). Runs off the DECODED feature frame, so the
    * shuffle carries ~100-byte rows — the payload bytes never move.
    * Same group-keep convention as `Dedup.exactDedup`. */
  def payloadDedup(documents: DataFrame): DataFrame =
    pipeline(documents)
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        max(col("n_bytes")).as("n_bytes"))

  /** Perceptual-hash media near-dup — the m_* analog of
    * `Dedup.minhashLsh`: pairs of media whose 64-bit blockhash
    * fingerprints (`graft_phash64`, computed scan-side at the decode
    * seam) are within `maxHamming` bits. Real corpora duplicate media
    * with re-encodes/crops/watermarks that break byte identity;
    * [[payloadDedup]] collapses exact copies, this catches the near
    * misses.
    *
    * Plan (multi-index hamming search, Norouzi et al. 2012's substring
    * scheme): (1) exact-dup collapse FIRST — identical payloads share a
    * fingerprint, so a g-copy group would otherwise cost g² candidate
    * pairs; one hash aggregate on content_md5, payload bytes never
    * shuffle. (2) split the 64-bit hash into `maxHamming + 1 = 4`
    * disjoint 16-bit bands; by pigeonhole, two hashes within hamming 3
    * agree EXACTLY on ≥ 1 band, so an equi-join on (band_id, band_val)
    * finds every qualifying pair — no O(n²) stage, shuffle ∝
    * candidates. (3) exact popcount verify (`graft_hamming64` on each
    * 32-bit half) kills band collisions; `distinct` folds multi-band
    * hits. Result is EXACTLY the brute-force hamming-≤-3 pair set
    * (spec-proven), and the DuckDB oracle recomputes every fingerprint
    * bit integer-exactly. At larger corpora the knobs scale the same
    * way as MinHash bands: longer hashes (256-bit → 64-bit bands) keep
    * band buckets sparse. */
  def phashNearDup(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val media = assemble(documents).toDF()
      .filter(length(col("bytes")) > 0)
      .select(col("doc_id"), md5(col("bytes")).as("content_md5"),
        graft.functions.GraftFunctions.phash64(col("bytes")).as("ph"))
    // lo/hi 32-bit halves: DuckDB BIGINT can't construct bit 63 by
    // shift, so the oracle-visible unit is two 32-bit words
    val reps = media.groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("ph")).as("ph"))
      .select(col("doc_id"),
        col("ph").bitwiseAND(lit(0xffffffffL)).as("lo"),
        shiftrightunsigned(col("ph"), 32).as("hi"))
    val bands = reps.select(col("doc_id"), col("lo"), col("hi"),
      posexplode(array(
        col("lo").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("lo"), 16),
        col("hi").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("hi"), 16))).as(Seq("band_id", "band_val")))
    val a = bands.select(col("band_id"), col("band_val"), col("doc_id").as("doc_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = bands.select(col("band_id"), col("band_val"), col("doc_id").as("doc_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        graft.functions.GraftFunctions.hamming64(col("lo_a"), col("lo_b")) +
          graft.functions.GraftFunctions.hamming64(col("hi_a"), col("hi_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_multimodal" -> ((s, d) => pipeline(Tables(s, d).documents)),
    "m_payload_dedup" -> ((s, d) => payloadDedup(Tables(s, d).documents)),
    "m_phash_neardup" -> ((s, d) => phashNearDup(Tables(s, d).documents)),
    "m_resize" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, length => blen, md5 => bmd5}
      resize(assemble(Tables(s, d).documents)).toDF()
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          blen(col("bytes")).as("n_bytes"), bmd5(col("bytes")).as("thumb_md5"))
    }),
    "m_frames" -> ((s, d) => sampleFrames(assemble(Tables(s, d).documents)).toDF()))

  val oracles: Map[String, String] = Map(
    "m_payload_dedup" ->
      """SELECT md5(COALESCE(text, '')) AS content_md5,
        |  MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies,
        |  CAST(MAX(octet_length(encode(COALESCE(text, '')))) AS INTEGER) AS n_bytes
        |FROM documents GROUP BY 1""".stripMargin,
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
        |FROM documents""".stripMargin,
    // integer ceil ((len*ta + oa - 1) // oa) mirrors the Scala stub
    // exactly — float ceil could round differently on exact divisions.
    // substring-on-text == byte slice because the corpus is pure ASCII
    // (verified at every SF; a non-ASCII corpus would need blob slicing).
    "m_resize" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    64 + doc_id % 512 AS w, 64 + (doc_id * 7) % 512 AS h,
        |    COALESCE(text, '') AS t,
        |    octet_length(encode(COALESCE(text, ''))) AS len
        |  FROM documents),
        |r AS (SELECT doc_id, media_type,
        |    least(len, (len * 4096 + w * h - 1) // (w * h)) AS nb, t
        |  FROM m)
        |SELECT doc_id, media_type,
        |  CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
        |  CAST(nb AS INT) AS n_bytes,
        |  md5(substring(t, 1, CAST(nb AS INT))) AS thumb_md5
        |FROM r""".stripMargin,
    "m_frames" ->
      """WITH m AS (SELECT doc_id, COALESCE(text, '') AS t,
        |    octet_length(encode(COALESCE(text, ''))) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, t, n,
        |    unnest(generate_series(0, CAST((n + 255) // 256 AS INT) - 1)) AS i
        |  FROM m WHERE n > 0)
        |SELECT doc_id, CAST(i AS INT) AS frame_index,
        |  CAST(least(n - i * 256, 256) AS INT) AS n_bytes,
        |  md5(substring(t, CAST(i * 256 + 1 AS INT), 256)) AS frame_md5
        |FROM f WHERE i % 4 = 0""".stripMargin)
}
