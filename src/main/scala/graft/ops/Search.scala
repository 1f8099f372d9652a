package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GraftFunctions

/** Full-text retrieval over the corpus (SURVEY.md §2.3): Okapi BM25
  * keyword search and BM25+vector hybrid fusion — the two retrieval
  * primitives a training-data pipeline needs for "find documents about
  * X" curation queries and RAG-style eval-set construction.
  *
  * Reference scope note: the reference engine (mbta-etl) has no search
  * surface at all; these follow the published BM25 (Robertson/Spärck
  * Jones; the `ln(1 + (N-df+0.5)/(df+0.5))` non-negative idf variant
  * popularized by Lucene) and Reciprocal Rank Fusion (Cormack et al.
  * 2009, k=60) formulas.
  *
  * Plan shape (100 TB story):
  *  - Tokenization + per-term tf are SCAN-SIDE: `graft_stopword_profile`
  *    (one codegen tokenization pass per row against the literal term
  *    lists) yields `[dl, tf_term1, …]` — no explode of the token
  *    stream, the corpus text never shuffles.
  *  - Corpus stats (N, Σdl, per-term df) are ONE tiny map-side-combined
  *    aggregate producing a single row, recombined via broadcast
  *    (`crossJoin` of a 1-row frame — same shape the ANN queries use).
  *  - Top-k is `orderBy(score).limit(k)` → TakeOrderedAndProject:
  *    per-partition heaps, only k rows ever reach the driver-side merge;
  *    the rank `row_number` window runs AFTER the limit, over ≤ k rows.
  *    No global sort, no per-query single-partition shuffle of the
  *    matched set.
  *  - Scores are per-term doubles (identical parenthesization on both
  *    engines — every division is IEEE-exact and `ln` agrees on this
  *    corpus, same reliance as t_perplexity) cast to DECIMAL(28,10) and
  *    summed exactly; ordering uses the exact decimal sum with a doc_id
  *    tie-break, display rounds to 4 per house policy.
  */
object Search {

  /** BM25 parameters (the standard defaults). */
  private val K1 = 1.2
  private val B  = 0.75

  /** The driver key's fixed query workload: high-/mid-frequency corpus
    * terms so every query matches at every SF. */
  private[graft] val bm25Queries: Seq[(String, Seq[String])] = Seq(
    "q0" -> Seq("hash", "join"),
    "q1" -> Seq("vector", "stream", "batch"),
    "q2" -> Seq("customer", "data"))

  /** Distinct terms across the workload, in first-appearance order —
    * one `stopwordProfile` slot per term. */
  private def distinctTerms(queries: Seq[(String, Seq[String])]): Seq[String] =
    queries.flatMap(_._2).distinct

  /** Per-doc scan-side profile: `doc_id, dl, tf_<term>…` in one codegen
    * tokenization pass (no token explode). */
  private def profile(documents: DataFrame, terms: Seq[String]): DataFrame = {
    val prof = GraftFunctions.stopwordProfile(col("text"),
      typedlit(terms.map(Seq(_))))
    documents.select(
      col("doc_id") +: prof.getItem(0).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          prof.getItem(i + 1).as(s"tf_$t")
        }: _*)
  }

  /** One-row corpus statistics: doc count, total token count, per-term
    * document frequency. */
  private def corpusStats(prof: DataFrame, terms: Seq[String]): DataFrame =
    prof.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)

  /** The exact-decimal BM25 score of one query (sum of per-term decimal
    * scores; zero-tf terms contribute exactly 0). Identical expression
    * order to the DuckDB oracle — see class doc. */
  private def scoreExpr(terms: Seq[String]): Column = {
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    terms.map { t =>
      val tf  = col(s"tf_$t").cast("double")
      val df  = col(s"df_$t")
      val idf = log(lit(1.0) + (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      val tfn = tf * lit(K1 + 1.0) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
      (idf * tfn).cast("decimal(28,10)")
    }.reduce(_ + _)
  }

  /** BM25 top-`k` per query over the fixed [[bm25Queries]] workload.
    * Output: `query_id, rank, doc_id, score` (matching docs only). */
  def bm25TopK(documents: DataFrame,
               queries: Seq[(String, Seq[String])] = bm25Queries,
               k: Int = 20): DataFrame = {
    val terms = distinctTerms(queries)
    val prof  = profile(documents, terms)
    val stats = broadcast(corpusStats(prof, terms))
    val scored = prof.crossJoin(stats)
    queries.map { case (qid, qTerms) =>
      val s = scored
        .filter(qTerms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
        .withColumn("s_exact", scoreExpr(qTerms))
        .orderBy(col("s_exact").desc, col("doc_id").asc)
        .limit(k)
      // rank window AFTER the limit: it only ever sees ≤ k rows
      s.select(lit(qid).as("query_id"),
          row_number().over(
            Window.orderBy(col("s_exact").desc, col("doc_id").asc)).as("rank"),
          col("doc_id"),
          (round(col("s_exact").cast("double"), 4) + lit(0.0)).as("score"))
    }.reduce(_.unionByName(_))
  }

  /** Reciprocal Rank Fusion (k=60) of a BM25 lexical list and an exact
    * cosine vector list over the same id space (`doc_id` ≡ `vec_id` in
    * the testdata corpus — each document has one embedding row).
    * The standard hybrid-search primitive: rrf = Σ_lists 1/(60+rank),
    * missing-from-a-list contributes 0.
    *
    * Both lists are top-`n` (TakeOrderedAndProject → rank over ≤ n
    * rows, same shape as [[bm25TopK]]); the fusion is a full-outer join
    * of two ≤ n-row frames — trivially broadcastable. 1/(60+rank) is
    * one IEEE-exact double division per side, cast DECIMAL(28,10),
    * summed exactly; ordering on the exact decimal, doc_id tie-break. */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                lexTerms: Seq[String] = Seq("hash", "join"),
                queryVecId: Long = 0L, n: Int = 100, k: Int = 20,
                rrfK: Int = 60): DataFrame = {
    val lex = bm25TopK(documents, Seq("q" -> lexTerms), n)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val q = broadcast(embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding")))
    val vecScored = embeddings
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(q)
      .withColumn("cos", GraftFunctions.cosine(col("embedding"), col("q_embedding")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(n)
    val vec = vecScored.select(col("vec_id"),
      row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)).as("vec_rank"))
    val fused = lex.join(vec, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        col("lex_rank"), col("vec_rank"))
      .withColumn("rrf_exact",
        coalesce((lit(1.0) / (lit(rrfK) + col("lex_rank"))).cast("decimal(28,10)"),
          lit(0).cast("decimal(28,10)")) +
          coalesce((lit(1.0) / (lit(rrfK) + col("vec_rank"))).cast("decimal(28,10)"),
            lit(0).cast("decimal(28,10)")))
    fused
      .orderBy(col("rrf_exact").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (round(col("rrf_exact").cast("double"), 4) + lit(0.0)).as("rrf_score"))
  }

  // ---- driver wiring ----

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "t_bm25" -> ((s, d) => bm25TopK(Tables(s, d).documents)),
    "s_hybrid_rrf" -> ((s, d) =>
      hybridRrf(Tables(s, d).documents, Tables(s, d).embeddings)))

  /** Shared oracle CTE: scan-side profile + one-row stats, mirroring
    * [[profile]]/[[corpusStats]] (list_filter == the kernel's
    * hash-set membership count, len(non-empty) == its token count). */
  private def profCte(terms: Seq[String]): String = {
    val tfCols = terms.map(t =>
      s"    len(list_filter(toks, x -> x = '$t')) AS tf_$t").mkString(",\n")
    val dfCols = terms.map(t =>
      s"    SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
       |  FROM documents),
       |prof AS (
       |  SELECT doc_id,
       |    len(list_filter(toks, x -> x != '')) AS dl,
       |$tfCols
       |  FROM toks),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    SUM(dl) AS total_tokens,
       |$dfCols
       |  FROM prof)""".stripMargin
  }

  /** Per-query exact-decimal BM25 score in DuckDB syntax — the same
    * expression order as [[scoreExpr]], term by term. */
  private def scoreSql(terms: Seq[String]): String =
    terms.map { t =>
      s"""CAST(ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5)) *
         |      (CAST(tf_$t AS DOUBLE) * 2.2 /
         |       (CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs))))
         |      AS DECIMAL(28,10))""".stripMargin.replaceAll("\n\\s*", " ")
    }.mkString(" + ")

  private def bm25QuerySql(qid: String, terms: Seq[String], k: Int): String = {
    val nonZero = terms.map(t => s"tf_$t").mkString(" + ")
    s"""SELECT '$qid' AS query_id, CAST(rank AS INTEGER) AS rank, doc_id, ROUND(CAST(s_exact AS DOUBLE), 4) + 0.0 AS score
       |FROM (
       |  SELECT doc_id, ${scoreSql(terms)} AS s_exact,
       |    row_number() OVER (ORDER BY ${scoreSql(terms)} DESC, doc_id ASC) AS rank
       |  FROM prof, stats
       |  WHERE $nonZero > 0)
       |WHERE rank <= $k""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "t_bm25" -> {
      val terms = distinctTerms(bm25Queries)
      s"""${profCte(terms)}
         |${bm25Queries.map { case (qid, ts) => bm25QuerySql(qid, ts, 20) }
            .mkString("\nUNION ALL\n")}""".stripMargin
    },
    "s_hybrid_rrf" -> {
      val lexTerms = Seq("hash", "join")
      s"""${profCte(lexTerms)},
         |lex AS (
         |  SELECT doc_id, CAST(rank AS INTEGER) AS lex_rank FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY ${scoreSql(lexTerms)} DESC, doc_id ASC) AS rank
         |    FROM prof, stats
         |    WHERE tf_hash + tf_join > 0)
         |  WHERE rank <= 100),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, q.qe),
         |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
         |    sqrt(list_sum(list_transform(e.embedding,
         |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS na,
         |    sqrt(list_sum(list_transform(q.qe,
         |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nb
         |  FROM embeddings e, q WHERE e.vec_id != 0),
         |vec AS (
         |  SELECT vec_id, CAST(rank AS INTEGER) AS vec_rank FROM (
         |    SELECT vec_id, row_number() OVER (
         |      ORDER BY (CASE WHEN na * nb = 0 THEN 0 ELSE dot / (na * nb) END) DESC,
         |        vec_id ASC) AS rank
         |    FROM vs)
         |  WHERE rank <= 100),
         |fused AS (
         |  SELECT COALESCE(lex.doc_id, vec.vec_id) AS doc_id, lex_rank, vec_rank,
         |    COALESCE(CAST(CAST(1.0 AS DOUBLE) / (60 + lex_rank) AS DECIMAL(28,10)),
         |        CAST(0 AS DECIMAL(28,10))) +
         |      COALESCE(CAST(CAST(1.0 AS DOUBLE) / (60 + vec_rank) AS DECIMAL(28,10)),
         |        CAST(0 AS DECIMAL(28,10))) AS rrf_exact
         |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.vec_id)
         |SELECT doc_id, lex_rank, vec_rank,
         |  ROUND(CAST(rrf_exact AS DOUBLE), 4) + 0.0 AS rrf_score
         |FROM fused
         |ORDER BY rrf_exact DESC, doc_id ASC
         |LIMIT 20""".stripMargin
    })
}
