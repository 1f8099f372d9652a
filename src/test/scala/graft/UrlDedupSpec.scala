package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlDedup

/** URL canonicalization + URL/domain-level dedup semantics: the rules
  * remove exactly what never changes the resource (scheme, www, default
  * port, tracking params, fragment, trailing slash) and preserve what
  * can (path case, parameter order, non-default ports). */
class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlDedup.canonicalUrl($"url")).collect().map(_.getString(0)).toSeq

  test("canonicalUrl: scheme/www/default-port/fragment/trailing-slash variants collapse") {
    val variants = Seq(
      "https://www.Example.com/A/B?page=2",
      "http://example.com:80/A/B?page=2",
      "HTTPS://WWW.EXAMPLE.COM:443/A/B/?page=2",
      "example.com/A/B?page=2#section-3",
      "https://example.com/A/B/?page=2#x")
    assert(canon(variants: _*).toSet == Set("example.com/A/B?page=2"))
  }

  test("canonicalUrl: tracking params stripped wherever they sit; separators repaired") {
    assert(canon("https://a.com/p?utm_source=x&page=2&utm_campaign=y") == Seq("a.com/p?page=2"))
    assert(canon("https://a.com/p?page=2&gclid=abc") == Seq("a.com/p?page=2"))
    assert(canon("https://a.com/p?fbclid=1&ref=tw") == Seq("a.com/p"))
    assert(canon("https://a.com/p/?utm_source=x") == Seq("a.com/p"))
    // first surviving param is promoted onto '?', later ones keep '&'
    assert(canon("https://a.com/p?utm_source=x&a=1&b=2") == Seq("a.com/p?a=1&b=2"))
  }

  test("canonicalUrl preserves what may matter: path case, param order, real ports") {
    assert(canon("https://a.com/Path/UPPER") == Seq("a.com/Path/UPPER"))
    assert(canon("https://a.com/p?b=2&a=1") == Seq("a.com/p?b=2&a=1"))
    assert(canon("https://a.com:8080/p") == Seq("a.com:8080/p"))
    // root url: bare host round-trips
    assert(canon("https://a.com/") == Seq("a.com"))
  }

  test("urlDedup groups by canonical form; min id survives; domainStats counts canonicals") {
    val urls = Seq(
      (10L, "https://www.shop.com/item/1?utm_source=mail"),
      (11L, "http://shop.com/item/1/"),
      (12L, "https://shop.com/item/2"),
      (13L, "https://Blog.com/post#top"),
      (14L, "https://blog.com:443/post")).toDF("doc_id", "url")
    val groups = UrlDedup.urlDedup(urls).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(groups == Map(
      "shop.com/item/1" -> (10L, 2L),
      "shop.com/item/2" -> (12L, 1L),
      "blog.com/post" -> (13L, 2L)))
    val stats = UrlDedup.domainStats(urls).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats == Map("shop.com" -> (3L, 2L), "blog.com" -> (2L, 1L)))
  }

  test("driver keys: synthetic-url dedup finds real collisions and is deterministic") {
    val out = UrlDedup.queries("d_url_dedup")(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getAs[Long]("n_dups") > 1), "synthetic corpus must contain URL dups")
    val again = UrlDedup.queries("d_url_dedup")(spark, TestSpark.sf0001).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // n_dups over all groups accounts for every document exactly once
    assert(out.map(_.getAs[Long]("n_dups")).sum ==
      graft.core.Tables(spark, TestSpark.sf0001).documents.count())
  }
}
