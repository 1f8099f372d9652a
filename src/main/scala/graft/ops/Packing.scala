package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-sequence packing (SURVEY.md §2.3): lay the corpus's token
  * stream end-to-end and cut it into fixed-size context windows — the
  * GPT-style "concatenate and chunk" batch-preparation step. A document
  * belongs to the chunk its FIRST token lands in, so the assignment is a
  * pure function of (ordering, token counts): deterministic, no packing
  * state, reproducible by any engine.
  *
  * Plan shape: one scan projecting (shard keys, doc_id, token count) —
  * the text itself never enters the shuffle — then ONE window cumsum per
  * shard and a hash aggregate over (shard, chunk). The window partitions
  * by the shard key, so per-partition state is a single running sum.
  *
  * Scale rule (100 TB): packing is sequential WITHIN a shard by nature —
  * parallelism comes from sharding. `source` alone is the oracle-scale
  * default; a production corpus passes finer shards (e.g. source ×
  * doc_id-range or date) via `shards` so no single window partition
  * exceeds an executor. Chunk ids are per-shard, which is exactly what a
  * data-parallel trainer wants (shards map to input workers).
  */
object Packing {

  /** BPE-ish token count (letter runs | single digits | single
    * punctuation) — the same segmentation `TextAnalysis.tokenStats`
    * reports, counted by a codegen `regexp_count` at scan speed. */
  private val TokenRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Per-(shard, chunk) packing summary for `ctx`-token context windows:
    * docs in the chunk, their total tokens, and the id range. */
  def seqPack(documents: DataFrame, ctx: Int = 512,
              shards: Seq[Column] = Seq(col("source"))): DataFrame = {
    require(ctx > 0, "context window must be positive")
    val w = Window.partitionBy(shards: _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(shards :+ col("doc_id") :+
        regexp_count(col("text"), lit(TokenRegex)).as("n_tokens"): _*)
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", floor(col("offset") / lit(ctx)))
      .groupBy(shards :+ col("chunk_id"): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("chunk_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Sliding-window chunk plan — the RAG / long-context preprocessing
    * step [[seqPack]] does NOT cover: instead of concatenating docs
    * end-to-end, each document is cut ALONE into overlapping
    * `window`-token chunks every `stride` tokens (stride < window ⇒
    * adjacent chunks share window−stride tokens of context, the
    * retrieval-embedding standard; stride = window ⇒ disjoint splits).
    * Emits one row per chunk with its token extent — the downstream
    * slicer/embedder consumes (doc_id, start_tok, chunk_tokens) without
    * this plan ever shuffling text.
    *
    * Every doc yields ≥ 1 chunk (an empty doc yields one empty chunk —
    * corpus coverage is exactly Σ n_chunks ≥ n_docs, no silent drops);
    * chunk i covers token [i·stride, min(i·stride+window, n_tokens)),
    * and only the LAST chunk may be short (proven: (n_chunks−1)·stride
    * ≥ n_tokens − window).
    *
    * Scale: pure scan-side — one codegen `regexp_count` token count +
    * an integer-arithmetic `sequence` explode; fan-out per doc is
    * ⌈(len−window)/stride⌉+1 ≈ len/stride, bounded and proportional to
    * the doc's own size (the same budget as reading it); NO shuffle,
    * NO aggregate — the plan parallelizes as the scan does at any
    * corpus size. All-integer arithmetic makes the chunk grid
    * engine-exact. */
  def chunkPlan(documents: DataFrame, window: Int = 256, stride: Int = 128): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    // NULL text counts as the empty doc (one empty chunk) — without the
    // coalesce, a NULL row's n_tokens/n_chunks go NULL and the sequence
    // explode silently DROPS the doc, breaking the coverage guarantee
    val nTok = regexp_count(coalesce(col("text"), lit("")), lit(TokenRegex)).cast("long")
    documents
      .select(col("doc_id"), col("source"), nTok.as("n_tokens"))
      .withColumn("n_chunks",
        when(col("n_tokens") <= window, lit(1L))
          .otherwise(lit(1L) +
            floor((col("n_tokens") - lit(window.toLong) + lit(stride.toLong) - lit(1L)) /
              lit(stride.toDouble)).cast("long")))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("source"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(window.toLong), col("n_tokens") - col("chunk_id") * stride).as("chunk_tokens"))
  }

  /** One packed bin: documents assigned whole (never split), with the
    * fill statistics a padding-aware trainer cares about. */
  final case class PackedBin(shard: String, bin_id: Long, n_docs: Long,
                             bin_tokens: Long, fill_frac: Double, oversize: Boolean)

  /** Scan projection row for [[seqBins]] (public: Catalyst codegen
    * instantiates it from generated code). */
  final case class DocTokens(shard: String, doc_id: Long, n_tokens: Long)

  /** NO-SPLIT bin packing — the fine-tuning-style packer: each document
    * goes WHOLE into a `ctx`-token bin (padding fills the remainder),
    * so [[seqPack]]'s concatenate-and-chunk split is replaced by
    * next-fit-decreasing per shard: docs sorted by token count
    * descending (then doc_id), a doc that would overflow the open bin
    * closes it and opens the next; docs longer than `ctx` become
    * flagged singleton oversize bins. Deterministic: the assignment is
    * a pure function of the sorted sequence, independent of input
    * partitioning (spec-proven).
    *
    * Bin packing is sequential WITHIN a shard by nature (the bound is
    * classic: next-fit uses < 2× the optimal bin count) — parallelism
    * comes from sharding, exactly as [[seqPack]] documents, so the
    * per-shard scan is genuine per-partition imperative state: a typed
    * repartition+sort+mapPartitions over (shard, doc_id, n_tokens)
    * rows — the TEXT never leaves the scan projection. At 100 TB pass
    * finer shards so each shard's (id, count) pairs stream through one
    * task; output is one row per ~ctx tokens.
    *
    * Oracle-checked: the recurrence carries ONE scalar state, so a
    * recursive CTE replays it exactly at oracle scale (see the
    * t_seq_bins mirror); semantics additionally spec-proven: capacity
    * respected, tokens conserved, < 2× optimal bins,
    * partitioning-invariant. */
  def seqBins(documents: DataFrame, ctx: Int = 512,
              shardCol: Column = col("source")): DataFrame = {
    require(ctx > 0, "context window must be positive")
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents
      .select(shardCol.cast("string").as("shard"), col("doc_id"),
        regexp_count(col("text"), lit(TokenRegex)).cast("long").as("n_tokens"))
      .as[DocTokens]
    toks
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .mapPartitions { it =>
        val out = Iterator.newBuilder[PackedBin]
        var shard: String = null
        var binId = -1L; var used = 0L; var docs = 0L
        def close(): Unit = if (docs > 0) {
          out += PackedBin(shard, binId, docs, used,
            math.min(1.0, used.toDouble / ctx), used > ctx)
        }
        it.foreach { d =>
          if (d.shard != shard) { close(); shard = d.shard; binId = -1; used = 0; docs = 0 }
          if (docs == 0 || used + d.n_tokens > ctx) {
            close(); binId += 1; used = 0; docs = 0
          }
          used += d.n_tokens; docs += 1
        }
        close()
        out.result()
      }
      .toDF()
  }

  /** Sequence-PACKING efficiency curve — the sweep behind [[seqBins]]'s
    * single context length (the knob a training run actually owns:
    * context length is a model/hardware decision, and this card prices
    * each candidate in padding waste): per candidate ctx, bins needed,
    * docs and tokens packed, oversize-bin count, and the overall
    * utilization tokens/(bins·ctx). Utilization falling as ctx grows
    * means the corpus' document-length profile can't fill long
    * contexts without chunking — read next to t_length_quantiles
    * before pinning ctx and a chunking policy.
    *
    * One [[seqBins]] pass per candidate (the packing recurrence is
    * inherently per-ctx — bin boundaries move), each collapsing to a
    * 1-row aggregate before the union: #ctxs × the base operator's
    * linear cost, ≤ 5-row output. Utilization is a quotient of exact
    * BIGINTs → the exact-integer half-away idiom (it can exceed 1.0
    * only via oversize singleton bins, which the card names). */
  def packCurve(documents: DataFrame,
                ctxs: Seq[Int] = Seq(256, 512, 1024, 2048)): DataFrame =
    ctxs.map { c =>
      seqBins(documents, c).agg(
        count(lit(1)).as("n_bins"),
        coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("bin_tokens")), lit(0L)).as("n_tokens"),
        coalesce(sum(when(col("oversize"), 1L).otherwise(0L)), lit(0L))
          .as("n_oversize"))
        .select(lit(c).as("ctx"), col("n_bins"), col("n_docs"),
          col("n_tokens"), col("n_oversize"))
    }.reduce(_ unionByName _)
      .select(col("ctx"), col("n_bins"), col("n_docs"), col("n_tokens"),
        col("n_oversize"),
        (when(col("n_bins") === 0L, lit(0.0)).otherwise(
          expr("CAST((20000 * n_tokens + n_bins * ctx) DIV (2 * n_bins * ctx) AS DOUBLE)")
            / lit(10000.0)) + lit(0.0)).as("util"))

  /** Best-fit-decreasing variant of [[seqBins]]: same contract (docs
    * whole, padding fills, oversize docs are flagged singletons,
    * descending (n_tokens, doc_id) order), but a doc goes into the
    * OPEN bin with the LEAST remaining capacity that still fits —
    * ties broken by lowest bin id — and a new bin opens only when NO
    * open bin fits. Classic guarantee: BFD ≤ 11/9·OPT + 4 bins (vs
    * next-fit's < 2×), and on every spec corpus it uses ≤ the NFD bin
    * count (property-proven, randomized differential vs a reference
    * implementation).
    *
    * Cost of the better fill: ALL bins stay open per shard, so
    * per-task state is O(bins) ≈ tokens/ctx entries of ~24 bytes (the
    * tightest-fit lookup is a TreeMap keyed by remaining capacity —
    * O(log bins) per doc). Same scale rule as [[seqBins]]: parallelism
    * comes from sharding; pass finer `shardCol` so one shard's bin
    * directory fits a task comfortably. Oracle-checked: the bin
    * directory itself is the recursive-CTE state (a per-shard fill
    * list), best-fit = lowest id at minimum sufficient remaining —
    * the TreeMap order as a list_min (see the t_seq_bins_bfd
    * mirror). */
  def seqBinsBfd(documents: DataFrame, ctx: Int = 512,
                 shardCol: Column = col("source")): DataFrame = {
    require(ctx > 0, "context window must be positive")
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents
      .select(shardCol.cast("string").as("shard"), col("doc_id"),
        regexp_count(col("text"), lit(TokenRegex)).cast("long").as("n_tokens"))
      .as[DocTokens]
    toks
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .mapPartitions { it =>
        import scala.collection.mutable
        val out = Iterator.newBuilder[PackedBin]
        var shard: String = null
        val used = mutable.ArrayBuffer.empty[Long]
        val docs = mutable.ArrayBuffer.empty[Long]
        // remaining capacity -> open bin ids at that remaining (min id first)
        val byRemaining = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]()
        def flush(): Unit = {
          var i = 0
          while (i < used.length) {
            out += PackedBin(shard, i.toLong, docs(i), used(i),
              math.min(1.0, used(i).toDouble / ctx), used(i) > ctx)
            i += 1
          }
          used.clear(); docs.clear(); byRemaining.clear()
        }
        def index(rem: Long, id: Int): Unit =
          byRemaining.computeIfAbsent(rem, _ => new java.util.TreeSet[Integer]()).add(id)
        it.foreach { d =>
          if (d.shard != shard) { flush(); shard = d.shard }
          if (d.n_tokens > ctx) {
            used += d.n_tokens; docs += 1L // oversize singleton, never indexed
          } else {
            val e = byRemaining.ceilingEntry(d.n_tokens)
            if (e == null) {
              used += d.n_tokens; docs += 1L
              index(ctx - d.n_tokens, used.length - 1)
            } else {
              val id: Int = e.getValue.first()
              e.getValue.remove(id)
              if (e.getValue.isEmpty) byRemaining.remove(e.getKey)
              used(id) += d.n_tokens; docs(id) += 1
              index(ctx - used(id), id)
            }
          }
        }
        flush()
        out.result()
      }
      .toDF()
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_seq_pack" -> ((s, d) => seqPack(Tables(s, d).documents)),
    "t_seq_bins" -> ((s, d) => seqBins(Tables(s, d).documents)),
    "t_pack_curve" -> ((s, d) => packCurve(Tables(s, d).documents)),
    "t_seq_bins_bfd" -> ((s, d) => seqBinsBfd(Tables(s, d).documents)),
    "t_chunk" -> ((s, d) => chunkPlan(Tables(s, d).documents)))

  val oracles: Map[String, String] = Map(
    // chunkPlan mirror: same token regexp (NULL text coalesced to the
    // empty doc on both engines — coverage, no silent drops), same
    // integer chunk grid via generate_series (all-integer arithmetic).
    "t_chunk" ->
      raw"""WITH tc AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |nc AS (
        |  SELECT doc_id, source, n_tokens,
        |    CASE WHEN n_tokens <= 256 THEN 1
        |         ELSE 1 + CAST(FLOOR((n_tokens - 256 + 127) / 128.0) AS BIGINT) END AS n_chunks
        |  FROM tc)
        |SELECT doc_id, source, CAST(cid AS BIGINT) AS chunk_id,
        |  CAST(cid * 128 AS BIGINT) AS start_tok,
        |  CAST(LEAST(256, n_tokens - cid * 128) AS BIGINT) AS chunk_tokens
        |FROM nc, unnest(generate_series(0, n_chunks - 1)) AS t(cid)""".stripMargin,
    "t_seq_pack" ->
      """WITH tk AS (
        |  SELECT source, doc_id,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT source, doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM tk)
        |SELECT source, CAST(FLOOR(off / 512.0) AS BIGINT) AS chunk_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM o GROUP BY 1, 2""".stripMargin,
    // Mirror of seqBins: the next-fit recurrence carries ONE scalar
    // state (open-bin fill), so a recursive CTE replays it exactly —
    // one recursion step per (shard, rank), all shards advancing in
    // parallel; depth = max docs/shard (oracle scale; the engine side
    // stays mapPartitions — recursion is the ORACLE's tool, not the
    // 100 TB plan). fill_frac = tokens/2⁹ is exact in binary, so the
    // double division is portable with no rounding discipline needed.
    "t_seq_bins" ->
      raw"""WITH RECURSIVE $packTokCte,
        |st(shard, rn, bin_id, used) AS (
        |  SELECT shard, rn, 0::BIGINT, n_tokens FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn,
        |    CASE WHEN st.used + o.n_tokens > 512 THEN st.bin_id + 1 ELSE st.bin_id END,
        |    CASE WHEN st.used + o.n_tokens > 512 THEN o.n_tokens ELSE st.used + o.n_tokens END
        |  FROM st JOIN ord o ON o.shard = st.shard AND o.rn = st.rn + 1),
        |asg AS (SELECT st.shard, st.bin_id, o.n_tokens
        |  FROM st JOIN ord o ON o.shard = st.shard AND o.rn = st.rn)
        |SELECT shard, bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
        |  least(1.0, CAST(SUM(n_tokens) AS DOUBLE) / 512) AS fill_frac,
        |  SUM(n_tokens) > 512 AS oversize
        |FROM asg GROUP BY 1, 2""".stripMargin,
    // packCurve mirror: one next-fit recurrence per candidate ctx (the
    // t_seq_bins chain with the capacity templated), per-bin collapse,
    // then a 1-row aggregate per ctx — exact integers + the half-away
    // utilization quotient.
    "t_pack_curve" ->
      (raw"""WITH RECURSIVE $packTokCte,
        |""".stripMargin +
        Seq(256, 512, 1024, 2048).map { c =>
          raw"""pkst$c(shard, rn, bin_id, used) AS (
            |  SELECT shard, rn, 0::BIGINT, n_tokens FROM ord WHERE rn = 1
            |  UNION ALL
            |  SELECT o.shard, o.rn,
            |    CASE WHEN pkst$c.used + o.n_tokens > $c THEN pkst$c.bin_id + 1 ELSE pkst$c.bin_id END,
            |    CASE WHEN pkst$c.used + o.n_tokens > $c THEN o.n_tokens ELSE pkst$c.used + o.n_tokens END
            |  FROM pkst$c JOIN ord o ON o.shard = pkst$c.shard AND o.rn = pkst$c.rn + 1),
            |pkb$c AS (SELECT st.shard, st.bin_id, CAST(COUNT(*) AS BIGINT) AS nd,
            |    CAST(SUM(o.n_tokens) AS BIGINT) AS bt
            |  FROM pkst$c st JOIN ord o ON o.shard = st.shard AND o.rn = st.rn
            |  GROUP BY 1, 2),
            |pkg$c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
            |    CAST(COALESCE(SUM(nd), 0) AS BIGINT) AS n_docs,
            |    CAST(COALESCE(SUM(bt), 0) AS BIGINT) AS n_tokens,
            |    CAST(COALESCE(SUM(CASE WHEN bt > $c THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_oversize
            |  FROM pkb$c)""".stripMargin
        }.mkString(",\n") + "\n" +
        Seq(256, 512, 1024, 2048).map { c =>
          s"""SELECT CAST($c AS INT) AS ctx, n_bins, n_docs, n_tokens, n_oversize,
             |  (CASE WHEN n_bins = 0 THEN 0.0 ELSE
             |    CAST((20000 * n_tokens + n_bins * $c) // (2 * n_bins * $c) AS DOUBLE) / 10000.0 END)
             |    + 0.0 AS util
             |FROM pkg$c""".stripMargin
        }.mkString("\nUNION ALL\n")),
    // Mirror of seqBinsBfd: the bin DIRECTORY itself is the recursive
    // state — a per-shard list of bin fills (index = bin_id + 1), one
    // doc-count list alongside. Best-fit = the lowest index among open
    // (fill ≤ ctx) bins at the minimum sufficient remaining capacity
    // (exactly the TreeMap's (remaining, id) order); NULL fit appends
    // a bin; oversize docs append unconditionally and, being > ctx,
    // never match the fit filter again — the "never indexed" rule for
    // free. List-min of an empty filter is NULL, which IS the no-fit
    // signal.
    "t_seq_bins_bfd" ->
      raw"""WITH RECURSIVE $packTokCte,
        |nmax AS (SELECT shard, MAX(rn) AS mx FROM ord GROUP BY 1),
        |st(shard, rn, b, d) AS (
        |  SELECT shard, rn, [n_tokens], [1::BIGINT] FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn,
        |    CASE WHEN fit.i IS NULL THEN list_append(st.b, o.n_tokens)
        |         ELSE list_transform(generate_series(1, len(st.b)),
        |                j -> CASE WHEN j = fit.i THEN st.b[j] + o.n_tokens ELSE st.b[j] END) END,
        |    CASE WHEN fit.i IS NULL THEN list_append(st.d, 1::BIGINT)
        |         ELSE list_transform(generate_series(1, len(st.d)),
        |                j -> CASE WHEN j = fit.i THEN st.d[j] + 1 ELSE st.d[j] END) END
        |  FROM st
        |  JOIN ord o ON o.shard = st.shard AND o.rn = st.rn + 1
        |  LEFT JOIN LATERAL (
        |    SELECT CASE WHEN o.n_tokens > 512 THEN NULL ELSE
        |      list_min(list_filter(generate_series(1, len(st.b)),
        |        j -> st.b[j] <= 512 AND 512 - st.b[j] >= o.n_tokens
        |             AND 512 - st.b[j] = list_min(list_transform(
        |               list_filter(generate_series(1, len(st.b)),
        |                 jj -> st.b[jj] <= 512 AND 512 - st.b[jj] >= o.n_tokens),
        |               jj -> 512 - st.b[jj])))) END AS i
        |  ) fit ON TRUE),
        |fin AS (SELECT st.shard, st.b, st.d
        |  FROM st JOIN nmax ON nmax.shard = st.shard AND nmax.mx = st.rn),
        |ex AS (SELECT shard, CAST(i - 1 AS BIGINT) AS bin_id, b[i] AS bin_tokens, d[i] AS n_docs
        |  FROM (SELECT shard, b, d, unnest(generate_series(1, len(b))) AS i FROM fin))
        |SELECT shard, bin_id, n_docs, bin_tokens,
        |  least(1.0, CAST(bin_tokens AS DOUBLE) / 512) AS fill_frac,
        |  bin_tokens > 512 AS oversize
        |FROM ex""".stripMargin)

  /** Shared (shard, rank, token-count) projection of both bin-packing
    * mirrors: the descending (n_tokens, doc_id) order both packers
    * consume. */
  private def packTokCte: String =
    raw"""toks AS (SELECT CAST(source AS VARCHAR) AS shard, doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |ord AS (SELECT shard, doc_id, n_tokens,
      |    row_number() OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id ASC) AS rn
      |  FROM toks)""".stripMargin
}
