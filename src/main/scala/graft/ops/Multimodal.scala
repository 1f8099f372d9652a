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
    * misses. Input: a media frame with `doc_id` + binary `bytes`
    * (e.g. `assemble(docs).toDF()`; the driver key uses
    * [[mediaWithPlantedNearDups]]).
    *
    * Plan (multi-index hamming search, Norouzi et al. 2012's substring
    * scheme): (1) exact-dup collapse FIRST — identical payloads share a
    * fingerprint, so a g-copy group would otherwise cost g² candidate
    * pairs; one hash aggregate on content_md5, payload bytes never
    * shuffle. (2) split the 64-bit hash into 4 disjoint 16-bit bands;
    * by pigeonhole, two hashes within hamming 3 agree EXACTLY on ≥ 1
    * band, so an equi-join on (band_id, band_val) finds every
    * qualifying pair — no O(n²) stage, shuffle ∝ candidates. The
    * completeness argument needs `maxHamming < #bands`, hence the
    * `require` below: a larger radius would silently drop pairs. (3)
    * exact popcount verify (`graft_hamming64` on each 32-bit half)
    * kills band collisions; `distinct` folds multi-band hits. Result
    * is EXACTLY the brute-force hamming-≤-maxHamming pair set over the
    * min-doc_id REPRESENTATIVES of each exact-dup (md5) class — pairs
    * involving a collapsed non-representative member are by design
    * absent (spec: TextAnalysisSpec "phashNearDup"). The DuckDB oracle
    * for the driver key recomputes every fingerprint bit
    * integer-exactly via the same cross-multiply threshold. At larger
    * corpora the knobs scale the same way as MinHash bands: longer
    * hashes (256-bit → 64-bit bands) keep band buckets sparse. */
  def phashNearDup(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band pigeonhole scheme is complete only for maxHamming <= 3, got $maxHamming")
    val fps = media
      .filter(length(col("bytes")) > 0)
      .select(col("doc_id"), md5(col("bytes")).as("content_md5"),
        graft.functions.GraftFunctions.phash64(col("bytes")).as("ph"))
    // lo/hi 32-bit halves: DuckDB BIGINT can't construct bit 63 by
    // shift, so the oracle-visible unit is two 32-bit words
    val reps = fps.groupBy(col("content_md5"))
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

  /** Perceptual-dup CLUSTERS — the transitive closure of
    * [[phashNearDup]]'s pair graph (a re-encode chain A≈B≈C is ONE
    * asset even when A and C drift past the pairwise radius), read off
    * as a per-cluster card: cluster id (min member) + member count.
    * The media twin of d_dup_clusters, and the input to a keep-one
    * policy per visual asset.
    *
    * Plan: the banded pair mining (∝ collisions), then the SAME
    * large-star/small-star CC the text clusters use
    * ([[DupClusters.connectedComponents]] — O(log n) rounds, driver
    * sees one checksum scalar per round); vertices are the pair
    * endpoints, so every emitted cluster has ≥ 2 members by
    * construction (singletons are exactly the non-colliding reps —
    * uninteresting rows the card omits). */
  def phashClusters(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val pairs = phashNearDup(media, maxHamming).select(col("doc_a"), col("doc_b"))
    val verts = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    DupClusters.connectedComponents(pairs, verts)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_media"))
  }

  /** Derived media corpus for the `m_phash_neardup` driver key: every
    * document's payload PLUS, for every `every`-th doc, a planted
    * near-dup variant (first two bytes swapped, doc_id offset by 10M).
    *
    * Why the swap: for payloads longer than 64 bytes, bytes 0 and 1
    * fall in the SAME blockhash block (block of j = j·64/n = 0 for
    * j ≤ 1, n > 64), so swapping them preserves every block sum →
    * IDENTICAL fingerprint (hamming 0) but a different md5 — a
    * guaranteed true near-dup pair that survives the exact-dup
    * collapse at every scale factor. This keeps the driver's
    * `spark_rows > 0` a live signal (an empty result would be
    * indistinguishable from a broken operator) and is byte-for-byte
    * reproducible in the DuckDB oracle (pure-ASCII corpus: char ops ==
    * byte ops, same guarantee the m_resize oracle relies on). Docs
    * whose first two bytes are equal are skipped — the swap would be
    * an exact dup and collapse. */
  def mediaWithPlantedNearDups(documents: DataFrame, every: Int = 41,
                               offset: Long = 10000000L): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val base = documents.select(col("doc_id"), encode(t, "UTF-8").as("bytes"))
    val planted = documents
      .filter(col("doc_id") % every === 0 && length(t) > 64 &&
        substring(t, 1, 1) =!= substring(t, 2, 1))
      .select((col("doc_id") + lit(offset)).as("doc_id"),
        encode(concat(substring(t, 2, 1), substring(t, 1, 1),
          substring(t, 3, Int.MaxValue)), "UTF-8").as("bytes"))
    base.unionByName(planted)
  }

  /** Per-media-type corpus card: count, payload bytes, distinct-payload
    * count and dup fraction — the media twin of t_corpus_report (the
    * release-governance row a multimodal dataset ships per modality,
    * and the sizing input for decode budgeting). One aggregate over the
    * feature frame ([[pipeline]] — payload bytes already reduced to
    * n_bytes/content_md5 scan-side, so nothing binary shuffles);
    * collapses to #modalities rows. */
  def mediaReport(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    pipeline(documents)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        countDistinct(col("content_md5")).as("n_unique_payloads"))
      .select(col("media_type"), col("n_media"), col("total_bytes"),
        col("n_unique_payloads"),
        (round(lit(1.0) - col("n_unique_payloads") / col("n_media"), 4) + lit(0.0))
          .as("dup_frac"))
  }

  /** Cross-media duplicate FRAMES: sampled-frame hashes shared by two
    * or more distinct media items — the sub-asset dedup layer between
    * whole-payload dedup (m_payload_dedup: byte-identical files) and
    * perceptual near-dup (m_phash_neardup): re-encoded compilations,
    * clipped reposts, and shared intros collide at the frame level
    * while neither whole-file test fires. One aggregate over the frame
    * table (frame hashes computed scan-side by [[sampleFrames]], the
    * payload never shuffles — ~50-byte hash rows do); groups with one
    * distinct doc are dropped, keeper = min doc_id (the exactDedup
    * convention). */
  def frameDedup(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    sampleFrames(assemble(documents)).toDF()
      .groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_docs") >= 2)
  }

  /** Perceptual-hash RADIUS curve — the tuning sweep behind
    * [[phashNearDup]]'s single `maxHamming`: per candidate radius
    * 0..3, how many near-dup pairs qualify and how many distinct
    * assets they touch. Radius 0 is re-encode-identical fingerprints;
    * each step admits blurrier matches — the knee (pairs exploding
    * faster than docs) is where the radius starts gluing distinct
    * assets together, the signal a dedup policy reads before pinning
    * its threshold (the MinHash banding-design twin, d_lsh_tuning, on
    * the media side).
    *
    * Plan: the banded candidate mining runs ONCE at the widest
    * complete radius (the pigeonhole bound) and is localCheckpointed
    * (the verified pair set — a few rows per colliding asset; without
    * this the two aggregate subtrees below would each re-mine); every
    * narrower radius is a conditional sum over it — two 1-row
    * aggregates (pair counts + distinct-doc counts over the exploded
    * endpoints) crossJoined and unpivoted by stack. All-integer
    * output, nothing float. */
  def phashCurve(media: DataFrame, radii: Seq[Int] = Seq(0, 1, 2, 3)): DataFrame = {
    require(radii.nonEmpty && radii.max <= 3,
      "16-bit-chunk blocking is exact only for hamming <= 3 (pigeonhole over 4 chunks)")
    val pairs = graft.ops.DupClusters.materialize(phashNearDup(media, radii.max))
    val pairAggs = radii.map(r =>
      sum(when(col("hamming") <= r, 1L).otherwise(0L)).as(s"p$r"))
    val cnt = pairs.agg(pairAggs.head, pairAggs.tail: _*)
    val docAggs = radii.map(r =>
      countDistinct(when(col("hamming") <= r, col("doc"))).as(s"d$r"))
    val docs = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"), col("hamming"))
      .agg(docAggs.head, docAggs.tail: _*)
    val stackArgs = radii.map(r => s"$r, coalesce(p$r, 0L), d$r").mkString(", ")
    cnt.crossJoin(broadcast(docs))
      .selectExpr(
        s"stack(${radii.size}, $stackArgs) AS (max_hamming, n_pairs, n_docs)")
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_multimodal" -> ((s, d) => pipeline(Tables(s, d).documents)),
    "m_media_report" -> ((s, d) => mediaReport(Tables(s, d).documents)),
    "m_frame_dedup" -> ((s, d) => frameDedup(Tables(s, d).documents)),
    "m_payload_dedup" -> ((s, d) => payloadDedup(Tables(s, d).documents)),
    "m_phash_neardup" -> ((s, d) =>
      phashNearDup(mediaWithPlantedNearDups(Tables(s, d).documents))),
    "m_phash_clusters" -> ((s, d) =>
      phashClusters(mediaWithPlantedNearDups(Tables(s, d).documents))),
    "m_phash_curve" -> ((s, d) =>
      phashCurve(mediaWithPlantedNearDups(Tables(s, d).documents))),
    "m_resize" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, length => blen, md5 => bmd5}
      resize(assemble(Tables(s, d).documents)).toDF()
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          blen(col("bytes")).as("n_bytes"), bmd5(col("bytes")).as("thumb_md5"))
    }),
    "m_frames" -> ((s, d) => sampleFrames(assemble(Tables(s, d).documents)).toDF()))

  /** Shared oracle CTE chain: planted media → integer-exact blockhash
    * fingerprints → md5-representatives → the brute-force hamming-≤3
    * pair set (`ppairs`). Recomputes every blockhash bit
    * integer-exactly: byte j → block j*64//n, bit b set iff
    * sum_b·n > total·len_b (the kernel's cross-multiply — no float
    * thresholds), assembled as two 32-bit words (BIGINT can't build
    * bit 63 by shift). Pure-ASCII corpus ⇒ ascii(substring) == byte
    * value (same guarantee as m_resize). Brute-force pair scan over
    * representatives is the oracle's privilege — the Spark plan uses
    * the banded equi-join instead. */
  private def phashPairsCte: String =
    """raw AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
      |media AS (
      |  SELECT doc_id, t FROM raw
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id,
      |    substring(t, 2, 1) || substring(t, 1, 1) || substring(t, 3) AS t
      |  FROM raw
      |  WHERE doc_id % 41 = 0 AND octet_length(encode(t)) > 64
      |    AND substring(t, 1, 1) <> substring(t, 2, 1)),
      |m AS (SELECT doc_id, t, md5(t) AS content_md5,
      |    CAST(octet_length(encode(t)) AS BIGINT) AS n
      |  FROM media WHERE octet_length(encode(t)) > 0),
      |b AS (SELECT doc_id, content_md5, n, t,
      |    unnest(generate_series(0, n - 1)) AS j
      |  FROM m),
      |v AS (SELECT doc_id, content_md5, n, (j * 64) // n AS blk,
      |    ascii(substring(t, CAST(j + 1 AS INT), 1)) AS val
      |  FROM b),
      |blocks AS (SELECT doc_id, content_md5, n, blk,
      |    SUM(val) AS sum_b, COUNT(*) AS len_b
      |  FROM v GROUP BY 1, 2, 3, 4),
      |tot AS (SELECT doc_id, SUM(sum_b) AS total FROM blocks GROUP BY 1),
      |hashes AS (SELECT k.doc_id, k.content_md5,
      |    CAST(SUM(CASE WHEN k.blk < 32 AND k.sum_b * k.n > t.total * k.len_b
      |      THEN CAST(1 AS BIGINT) << CAST(k.blk AS INT) ELSE 0 END) AS BIGINT) AS lo,
      |    CAST(SUM(CASE WHEN k.blk >= 32 AND k.sum_b * k.n > t.total * k.len_b
      |      THEN CAST(1 AS BIGINT) << CAST(k.blk - 32 AS INT) ELSE 0 END) AS BIGINT) AS hi
      |  FROM blocks k JOIN tot t ON k.doc_id = t.doc_id
      |  GROUP BY 1, 2),
      |reps AS (SELECT MIN(doc_id) AS doc_id, MIN(lo) AS lo, MIN(hi) AS hi
      |  FROM hashes GROUP BY content_md5),
      |ppairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
      |  FROM reps a JOIN reps b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    "m_phash_neardup" -> s"WITH $phashPairsCte\nSELECT doc_a, doc_b, hamming FROM ppairs",
    // phashCurve mirror: the same verified pair set, one conditional
    // sum per radius + distinct endpoints per radius, all integers.
    "m_phash_curve" ->
      (s"""WITH $phashPairsCte,
          |pcc AS (SELECT
          |    ${Seq(0, 1, 2, 3).map(r =>
               s"CAST(COALESCE(SUM(CASE WHEN hamming <= $r THEN 1 ELSE 0 END), 0) AS BIGINT) AS p$r")
               .mkString(",\n    ")}
          |  FROM ppairs),
          |pdd AS (SELECT
          |    ${Seq(0, 1, 2, 3).map(r =>
               s"CAST(COUNT(DISTINCT CASE WHEN hamming <= $r THEN doc END) AS BIGINT) AS d$r")
               .mkString(",\n    ")}
          |  FROM (SELECT doc_a AS doc, hamming FROM ppairs
          |        UNION ALL SELECT doc_b AS doc, hamming FROM ppairs))
          |""".stripMargin +
        Seq(0, 1, 2, 3).map(r =>
          s"SELECT CAST($r AS INT) AS max_hamming, p$r AS n_pairs, d$r AS n_docs FROM pcc, pdd")
          .mkString("\nUNION ALL\n")),
    // phashClusters mirror: min-over-reachable closure of the same
    // pair set, vertices = pair endpoints (every cluster ≥ 2 members).
    "m_phash_clusters" ->
      s"""WITH RECURSIVE $phashPairsCte,
         |e0m AS (SELECT doc_a AS u, doc_b AS v FROM ppairs),
         |em AS (SELECT u, v FROM e0m UNION SELECT v AS u, u AS v FROM e0m),
         |vm AS (SELECT DISTINCT u AS id FROM em),
         |reachm(id, r) AS (
         |  SELECT id, id FROM vm
         |  UNION
         |  SELECT em.v, reachm.r FROM reachm JOIN em ON em.u = reachm.id),
         |assignm AS (SELECT id, MIN(r) AS root FROM reachm GROUP BY id)
         |SELECT root AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_media
         |FROM assignm GROUP BY 1""".stripMargin,
    "m_payload_dedup" ->
      """SELECT md5(COALESCE(text, '')) AS content_md5,
        |  MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies,
        |  CAST(MAX(octet_length(encode(COALESCE(text, '')))) AS INTEGER) AS n_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    // Mirror of mediaReport over the m_multimodal feature CTE: one
    // aggregate per modality, exact integer sums, ROUND(,4)+0.0 dup
    // fraction.
    "m_media_report" ->
      """WITH f AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  octet_length(encode(COALESCE(text, ''))) AS n_bytes,
        |  md5(COALESCE(text, '')) AS content_md5
        |FROM documents)
        |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(COUNT(DISTINCT content_md5) AS BIGINT) AS n_unique_payloads,
        |  ROUND(1.0 - CAST(COUNT(DISTINCT content_md5) AS DOUBLE) / COUNT(*), 4) + 0.0
        |    AS dup_frac
        |FROM f GROUP BY 1""".stripMargin,
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
    // Mirror of frameDedup over the m_frames CTE: group by frame hash,
    // keep multi-doc groups, min-doc keeper.
    "m_frame_dedup" ->
      """WITH m AS (SELECT doc_id, COALESCE(text, '') AS t,
        |    octet_length(encode(COALESCE(text, ''))) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, t, n,
        |    unnest(generate_series(0, CAST((n + 255) // 256 AS INT) - 1)) AS i
        |  FROM m WHERE n > 0),
        |fr AS (SELECT doc_id,
        |    md5(substring(t, CAST(i * 256 + 1 AS INT), 256)) AS frame_md5
        |  FROM f WHERE i % 4 = 0)
        |SELECT frame_md5, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS keeper_doc
        |FROM fr GROUP BY 1
        |HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,
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
