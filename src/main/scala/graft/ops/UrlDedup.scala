package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL/domain-level deduplication (SURVEY.md §2.3) — the third axis
  * real crawl pipelines dedup on, alongside content (exact/near) and
  * substring duplication: the same page fetched under syntactically
  * different URLs (scheme, www, default port, tracking params,
  * fragment, trailing slash) must collapse to ONE canonical key before
  * any fetch or content-dedup work is spent on it.
  *
  * Normalization is a chain of native `regexp_replace`/`regexp_extract`
  * column expressions (codegen'd, scan-side, RE2-safe patterns so the
  * DuckDB oracle runs the identical rules — same engine-portability
  * rationale as t_pii_scrub). Dedup itself is the exact-dedup shape:
  * one map-side-combined hash aggregate on the canonical key — the
  * cheapest possible plan at crawl scale, no shuffle of the URLs'
  * documents.
  */
object UrlDedup {

  /** Lower-cased host with `www.` and default ports stripped. */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "(?i)^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:www\\.)?([^/?#]+)", 1)),
      ":(?:80|443)$", "")

  /** Canonical URL: host (normalized as [[host]]) + path/query with
    *  - the fragment removed,
    *  - tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`) removed,
    *  - a trailing slash on the path stripped,
    * while preserving path case and the order of surviving parameters
    * (reordering is not safe for every site — canonicalization only
    * removes what provably never changes the resource). */
  def canonicalUrl(url: Column): Column = {
    val rest0 = regexp_extract(url, "(?i)^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:www\\.)?[^/?#]*([^#]*)", 1)
    // drop tracking params wherever they sit, then repair separators:
    // a '?' that lost its first param promotes the next '&', and a
    // dangling '?'/'&' disappears with the params it introduced
    val noTrack = regexp_replace(rest0, "[?&](?:utm_[a-zA-Z]+|gclid|fbclid|ref)=[^&#]*", "")
    val fixedSep = regexp_replace(noTrack, "^([^?&]*)&", "$1?")
    val noSlash = regexp_replace(fixedSep, "/+(\\?|$)", "$1")
    concat(host(url), noSlash)
  }

  /** Exact URL-level dedup: one group per canonical URL with the
    * smallest id as survivor — `(canon_url, keep_id, n_dups)`, the
    * URL-axis twin of `Dedup.exactDedup`. */
  def urlDedup(urls: DataFrame, idCol: String = "doc_id", urlCol: String = "url"): DataFrame =
    urls
      .select(col(idCol), canonicalUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Domain-level profile: per normalized host, raw URL count and
    * canonical-URL count — the dedup-rate report crawl scheduling runs
    * on (a host whose canonical count is far below its raw count is
    * serving duplicate surfaces). Two map-side-combined aggregates. */
  def domainStats(urls: DataFrame, urlCol: String = "url"): DataFrame =
    urls
      .select(host(col(urlCol)).as("host"), canonicalUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("canon_url")).as("n_canonical"))

  // ---- driver wiring ----

  import graft.core.Tables

  /** The test corpus has no URL column, so the driver keys run the
    * operators over a DETERMINISTIC synthetic URL per document — built
    * to exercise every normalization rule (scheme/www/port variants by
    * doc_id residue, tracking params always present, optional real
    * param, fragment, optional trailing slash) and mirrored verbatim in
    * the oracle SQL. Collisions are real: the canonical key folds to
    * (source, lang, doc_id mod 50), which repeats across documents. */
  private def syntheticUrls(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat(
        when(pmod(col("doc_id"), lit(3)) === 0, lit("http://www.")).otherwise(lit("https://")),
        col("source"), lit(".Example.com"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit(":443")).otherwise(lit("")),
        lit("/"), col("lang"), lit("/doc-"), (pmod(col("doc_id"), lit(50))).cast("string"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("&page=2")).otherwise(lit("")),
        lit("&utm_campaign=c"), col("doc_id").cast("string"),
        lit("#frag")).as("url"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_url_dedup"   -> ((s, d) => urlDedup(syntheticUrls(Tables(s, d).documents))),
    "d_url_domains" -> ((s, d) => domainStats(syntheticUrls(Tables(s, d).documents))))

  /** DuckDB mirror of [[syntheticUrls]] + the normalization chain.
    * DuckDB's regexp_replace needs the 'g' flag for replace-all (Spark
    * replaces all by default); patterns are RE2-safe (no lookarounds). */
  private val urlCte =
    """WITH u AS (
      |  SELECT doc_id,
      |    concat(
      |      CASE WHEN doc_id % 3 = 0 THEN 'http://www.' ELSE 'https://' END,
      |      source, '.Example.com',
      |      CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END,
      |      '/', lang, '/doc-', CAST(doc_id % 50 AS VARCHAR),
      |      CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
      |      '?utm_source=feed',
      |      CASE WHEN doc_id % 5 = 0 THEN '&page=2' ELSE '' END,
      |      '&utm_campaign=c', CAST(doc_id AS VARCHAR),
      |      '#frag') AS url
      |  FROM documents),
      |n AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      lower(regexp_extract(url, '(?i)^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:www\.)?([^/?#]+)', 1)),
      |      ':(?:80|443)$', '') AS host,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_extract(url, '(?i)^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:www\.)?[^/?#]*([^#]*)', 1),
      |          '[?&](?:utm_[a-zA-Z]+|gclid|fbclid|ref)=[^&#]*', '', 'g'),
      |        '^([^?&]*)&', '\1?'),
      |      '/+(\?|$)', '\1') AS rest
      |  FROM u),
      |c AS (SELECT doc_id, host, concat(host, rest) AS canon_url FROM n)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d_url_dedup" ->
      s"""$urlCte
         |SELECT canon_url, MIN(doc_id) AS keep_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_dups
         |FROM c GROUP BY 1""".stripMargin,
    "d_url_domains" ->
      s"""$urlCte
         |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_canonical
         |FROM c GROUP BY 1""".stripMargin)
}
