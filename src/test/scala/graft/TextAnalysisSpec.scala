package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, TestSpark.sf0001).documents

  test("langId: stopword argmax with deterministic tie order") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),   // en
      (2L, "der hund und die katze ist nicht da"), // de
      (3L, "xyzzy qwerty plugh"),                  // no stopwords
      (4L, "le chat est dans la maison pour que")  // fr
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "unknown", 4L -> "fr"))
  }

  test("langId covers every document exactly once") {
    val out = TextAnalysis.langId(docs)
    assert(out.count() == docs.count())
    assert(out.select("lang_pred").distinct().collect()
      .map(_.getString(0))
      .forall((TextAnalysis.langOrder :+ "unknown").toSet))
  }

  test("CJK segmentation: one token per CJK letter, identity on Latin text; the sf testdata is CJK-free (the legacy-mirror elision contract)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextKernels
    def toks(s: String): Seq[String] =
      TextKernels.tokenize(UTF8String.fromString(s)).toSeq
    // space-free scripts segment per codepoint; embedded Latin stays
    // whitespace-tokenized, mixed runs split at the class boundary
    assert(toks("我爱你") == Seq("我", "爱", "你"))
    assert(toks("abc漢字 def") == Seq("abc", "漢", "字", "def"))
    assert(toks("ひらがなとカタカナ") ==
      Seq("ひ", "ら", "が", "な", "と", "カ", "タ", "カ", "ナ"))
    assert(toks("한국어 text") == Seq("한", "국", "어", "text"))
    // r15 widened classes: Extension-A ideographs, katakana phonetic
    // extensions, halfwidth katakana segment like their base blocks
    assert(toks("㐀㑊") == Seq("㐀", "㑊"), "Ext-A ideographs must segment")
    assert(toks("ｱｲｳ") == Seq("ｱ", "ｲ", "ｳ"), "halfwidth katakana must segment")
    assert(toks("ㇰㇱ") == Seq("ㇰ", "ㇱ"), "katakana phonetic extensions must segment")
    // identity on CJK-free text — the exact pre-r14 tokenization
    assert(toks("The  Cat\tSat ") == Seq("the", "cat", "sat"))
    // the elision contract: every legacy mirror that tokenizes without
    // the segmentation pre-pass is exact on this data ONLY because no
    // CJK codepoint occurs in it — assert that precondition (the r15
    // widened class, so a future testdata drift into the new ranges
    // trips it too)
    assert(docs.filter(col("text")
      .rlike(raw"[\x{3040}-\x{30ff}\x{31f0}-\x{31ff}\x{3400}-\x{4dbf}\x{4e00}-\x{9fff}\x{ac00}-\x{d7af}\x{ff66}-\x{ff9d}]"))
      .count() == 0L,
      "testdata grew CJK text — the pre-r14 oracle mirrors' elision of " +
        "the segmentation pre-pass is no longer sound; add it there")
  }

  test("CJK langid: zh/ja/ko seeds id planted documents; the script arm ids function-word-free Han text the stopword argmax cannot") {
    val planted = TextAnalysis.cjkDocs.toDF("doc_id", "lang", "source", "text")
    val byId = TextAnalysis.langId(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(byId(9000001L) == "zh" && byId(9000002L) == "ja" &&
      byId(9000003L) == "ko" && byId(9000005L) == "en")
    // the Han-only title has zero seeded function characters — the
    // stopword argmax is blind to it…
    assert(byId(9000004L) == "unknown")
    // …and the script arm is exactly the fallback that catches it
    val scripted = TextAnalysis.langIdScript(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(scripted(9000004L) == "zh")
    assert(scripted(9000001L) == "zh" && scripted(9000002L) == "ja" &&
      scripted(9000003L) == "ko" && scripted(9000005L) == "en")
    // confusion matrix over a corpus WITH a CJK source: the planted
    // docs land on the zh/ja/ko diagonal (plus the declared-zh
    // Han-title read as unknown by the stopword arm — the documented
    // blind spot the script arm exists for)
    val conf = TextAnalysis.langConfusion(
      TextAnalysis.cjkUnion(spark, TestSpark.sf0001))
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[String]("lang_pred")) -> r.getAs[Long]("n")).toMap
    assert(conf(("ja", "ja")) == 1L && conf(("ko", "ko")) == 1L)
    assert(conf(("zh", "zh")) == 1L && conf(("zh", "unknown")) >= 1L)
    // quality in the document's own language: the zh doc carries real
    // function-character mass — n_stop_lang > 0 (the en-centric rule
    // would read 0)
    val q = TextAnalysis.qualityByLang(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_stop_lang")).toMap
    assert(q(9000001L) > 0 && q(9000002L) > 0 && q(9000003L) > 0)
  }

  test("ru/ar/hi (r15): stopword lists id planted documents; the script arms catch function-word-free Cyrillic; confusion matrix diagonal") {
    val planted = TextAnalysis.cjkDocs.toDF("doc_id", "lang", "source", "text")
    val byId = TextAnalysis.langId(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(byId(9000006L) == "ru" && byId(9000007L) == "ar" && byId(9000008L) == "hi")
    // the Cyrillic title carries none of the seeded ru function words —
    // blind spot for the argmax, caught by the script arm
    assert(byId(9000009L) == "unknown")
    val scripted = TextAnalysis.langIdScript(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(scripted(9000009L) == "ru")
    assert(scripted(9000006L) == "ru" && scripted(9000007L) == "ar"
      && scripted(9000008L) == "hi")
    // confusion matrix over the union corpus: ru/ar/hi diagonal mass
    // (plus the declared-ru Cyrillic title the stopword arm reads as
    // unknown — the documented blind spot)
    val conf = TextAnalysis.langConfusion(
      TextAnalysis.cjkUnion(spark, TestSpark.sf0001))
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[String]("lang_pred")) -> r.getAs[Long]("n")).toMap
    assert(conf(("ru", "ru")) == 1L && conf(("ar", "ar")) == 1L
      && conf(("hi", "hi")) == 1L && conf(("ru", "unknown")) >= 1L)
    // lang-aware quality: each planted doc has real function-word mass
    // in its OWN language (the en-centric rule reads 0 on all three)
    val q = TextAnalysis.qualityByLang(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_stop_lang")).toMap
    assert(q(9000006L) > 0 && q(9000007L) > 0 && q(9000008L) > 0)
  }

  test("qualityModel (r15): terciles partition the corpus, the declared hq source scores above corpus mean, curve is monotone") {
    val out = TextAnalysis.qualityModel(docs).collect()
    val n = out.length
    assert(n > 0)
    val byBucket = out.groupBy(_.getAs[String]("q_bucket"))
      .view.mapValues(_.length).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.sum == n)
    // tercile cuts: each bucket holds roughly a third (ROUND(,4) score
    // ties can shift a boundary, never past a quarter on this corpus)
    assert(byBucket.values.forall(c => c >= n / 4 && c <= n / 2), byBucket.toString)
    // the classifier's training objective: the declared hq source's
    // own docs must average above the corpus (its frequent buckets got
    // the positive log-odds)
    def mean(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("q_score")).sum / rs.length
    val src0 = out.toSeq.filter(_.getAs[String]("source") == "src0")
    assert(src0.nonEmpty && mean(src0) > mean(out.toSeq),
      "hq-source docs must score above the corpus mean")
    // budget curve: selection grows, threshold and mean score decay as
    // the budget loosens
    val curve = TextAnalysis.qualityModelCurve(docs).collect()
      .sortBy(_.getAs[Double]("budget_frac"))
    assert(curve.length == 4)
    def monotone(vals: Seq[Double], incr: Boolean) =
      vals.zip(vals.tail).forall { case (a, b) => if (incr) a <= b else a >= b }
    assert(monotone(curve.map(_.getAs[Long]("n_selected").toDouble).toSeq, incr = true))
    assert(monotone(curve.map(_.getAs[Double]("tau")).toSeq, incr = false))
    assert(monotone(curve.map(_.getAs[Double]("mean_q_score")).toSeq, incr = false))
  }

  test("Catalog quality model (r16): cached fit + materialized scores equal the in-plan forms; served keys read the shared frame") {
    val dir = TestSpark.sf0001
    val corpus = graft.core.Tables(spark, dir).documents
    // the cached artifact IS the in-plan fit
    val cachedFit = graft.core.Catalog.qualityModel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val planFit = TextAnalysis.qualityModelFit(corpus).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(cachedFit == planFit, "cached artifact must equal the in-plan fit")
    // the cached score frame IS the in-plan scores
    def scoreMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[Long]("n_feats"),
          r.getAs[Double]("q_score"))).toMap
    assert(scoreMap(graft.core.Catalog.qualityScores(spark, dir)) ==
      scoreMap(TextAnalysis.qualityModelScores(corpus)),
      "cached scores must equal the in-plan scores")
    // the served tercile card off the shared frame equals the in-plan key
    val served = TextAnalysis.qualityModelFromScores(
      graft.core.Catalog.qualityScores(spark, dir)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("q_bucket")).toMap
    val inPlan = TextAnalysis.qualityModel(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("q_bucket")).toMap
    assert(served == inPlan, "served tercile card must equal the in-plan key")
  }

  test("langId: the r13 lists identify Italian, Portuguese and Dutch") {
    val df = Seq(
      (1L, "il gatto e il cane che vive per la casa di roma non dorme"),
      (2L, "o gato e o cachorro que vive em casa do porto um dia"),
      (3L, "de kat en de hond van het huis een dag ik niet dat"),
      (4L, "el gato y el perro es por una casa que")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out == Map(1L -> "it", 2L -> "pt", 3L -> "nl", 4L -> "es"))
  }

  test("langConfusion with a non-en source: clean diagonal for Portuguese; a mislabeled source shows off-diagonal mass") {
    // a correctly-labeled Portuguese source and a source DECLARED en
    // whose text is actually Italian — the governance case the card
    // exists for (mislabeled upstream metadata)
    val df = Seq(
      (1L, "pt", "o gato e o cachorro que vive em casa do porto um dia"),
      (2L, "pt", "a menina que mora em casa do lado um gato e o mar"),
      (3L, "en", "il gatto e il cane che vive per la casa di roma non dorme"),
      (4L, "en", "the cat and the dog of the house is that")
    ).toDF("doc_id", "lang", "text")
    val conf = TextAnalysis.langConfusion(df).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(conf((("pt"), ("pt")))._2 == 1.0, "clean pt source must sit on the diagonal")
    assert(conf((("en"), ("it"))) == ((1L, 0.5)),
      "the mislabeled en row must show its Italian off-diagonal mass")
    assert(conf((("en"), ("en"))) == ((1L, 0.5)))
  }

  test("qualityByLang: a clean French document scores high where the en-centric rule cannot") {
    val fr = Array.fill(7)("le chat est dans la maison pour que").mkString(" ")
    val df = Seq((1L, fr), (2L, "xyzzy " * 60)).toDF("doc_id", "text")
    val byLang = TextAnalysis.qualityByLang(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 56 French tokens, zero English stopwords: en-centric quality says
    // medium (no stopword credit), the per-lang rule says high
    assert(byLang(1L).getAs[String]("lang_pred") == "fr")
    assert(byLang(1L).getAs[String]("quality_bucket") == "high")
    val enCentric = TextAnalysis.quality(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("quality_bucket")).toMap
    assert(enCentric(1L) == "medium",
      "the en-centric rule must deny the French doc its stopword credit")
    // stopword-free junk stays non-high under BOTH rules
    assert(byLang(2L).getAs[String]("quality_bucket") == "medium")
    // the per-lang stopword signal equals the winning list's hits:
    // 6 fr stopwords per rep (le, est, dans, la, pour, que) × 7 reps
    assert(byLang(1L).getAs[Int]("n_stop_lang") == 6 * 7)
  }

  test("quality: ratios bounded, buckets exhaustive") {
    val out = TextAnalysis.quality(docs)
    assert(out.count() == docs.count())
    assert(out.filter($"punct_ratio" < 0 || $"punct_ratio" > 1).count() == 0)
    assert(out.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
    assert(out.filter(!$"quality_bucket".isin("high", "medium", "low")).count() == 0)
  }

  test("quality: empty-ish text counts zero tokens and does not divide by zero") {
    val out = TextAnalysis.quality(Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") == 0.0)
      assert(r.getAs[Int]("n_tokens") == 0)
    }
    val ts = TextAnalysis.tokenStats(Seq((1L, "  ", "s1")).toDF("doc_id", "text", "source")).collect()(0)
    assert(ts.getAs[Long]("total_ws_tokens") == 0L)
  }

  test("tokenStats: BPE-ish segmentation counts letter runs, digits, punct") {
    val out = TextAnalysis.tokenStats(
      Seq((1L, "ab12, cd!", "s1")).toDF("doc_id", "text", "source")).collect()(0)
    // "ab" + "1" + "2" + "," + "cd" + "!" = 6 bpe tokens; 2 ws tokens
    assert(out.getAs[Long]("total_bpe_tokens") == 6L)
    assert(out.getAs[Long]("total_ws_tokens") == 2L)
  }

  test("langId/quality/tokenStats run fully inside WholeStageCodegen (no HOF fallback)") {
    for (df <- Seq(TextAnalysis.langId(docs), TextAnalysis.quality(docs),
                   TextAnalysis.tokenStats(docs))) {
      df.collect() // finalize the adaptive plan so codegen stages are visible
      val plan = df.queryExecution.executedPlan.toString
      val line = plan.linesIterator.find(_.contains("graft_stopword_profile"))
      assert(line.isDefined && line.get.trim.stripPrefix("+- ").startsWith("*"),
        s"graft_stopword_profile not in a codegen stage:\n$plan")
      // the interpreted lambda machinery must be gone from the hot path
      assert(!plan.contains("lambdafunction"), s"HOF survived in plan:\n$plan")
    }
  }

  test("filterPipeline: first-failing rule wins, agrees with the individual signal operators") {
    import graft.ops.TextAnalysis
    val loop = Seq.fill(30)("spam spam spam").mkString(" ") // repetitive AND templated
    val cases = Seq(
      (1L, "s", "tiny doc"),                                            // too_short
      (2L, "s", (1 to 25).map(i => s"tok$i").mkString(" ")),            // no stopword hit
      (3L, "s", "the " + loop),                                         // repetitive (ordered before templated)
      (4L, "s", "the quick brown fox jumps over a lazy dog and then " +
        "walks to the old market where fresh bread is sold daily"))     // keep
    val out = TextAnalysis.filterPipeline(cases.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(out == Map(1L -> "too_short", 2L -> "no_stopwords",
      3L -> "repetitive", 4L -> "keep"))
    // corpus-level: every verdict's signal agrees with the stand-alone operator
    val fp = TextAnalysis.filterPipeline(docs)
    assert(fp.count() == docs.count(), "one verdict per document")
    val repTruth = TextAnalysis.repetition(docs)
      .filter($"rep_flag" === "repetitive").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val flaggedRep = fp.filter($"verdict" === "repetitive")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(flaggedRep.subsetOf(repTruth),
      "a 'repetitive' verdict must come with the stand-alone operator's flag")
    // one scan pass: no exchange anywhere in the plan
    val df = fp; df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "filterPipeline must be a pure scan-side pipeline")
  }

  test("corpusReport: one row per source, counts reconcile with the underlying operators") {
    import graft.ops.TextAnalysis
    val report = TextAnalysis.corpusReport(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(report.size == docs.select($"source").distinct().count())
    val srcDocs = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.map { case (s, r) => s -> r.getAs[Long]("n_docs") } == srcDocs)
    // keep counts reconcile with filterPipeline; uniques with exactDedup's domain
    val keeps = TextAnalysis.filterPipeline(docs).filter($"verdict" === "keep")
      .groupBy($"source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    report.foreach { case (s, r) =>
      assert(r.getAs[Long]("n_keep") == keeps.getOrElse(s, 0L), s"keep count for $s")
      assert(r.getAs[Long]("n_unique_texts") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("keep_frac") >= 0.0 && r.getAs[Double]("keep_frac") <= 1.0)
    }
  }

  test("contamReport: per-eval-source breakdown, single-eval slice equals decontaminate") {
    import graft.ops.TextAnalysis
    val report = TextAnalysis.contamReport(docs, evalSources = Seq("src18", "src19"))
    val slice19 = report.filter($"eval_source" === "src19")
      .select($"doc_id", $"source", $"n_hits").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // src19-vs-rest from the report must equal the single-eval operator
    // restricted to the same corpus side (docs not in ANY eval source)
    val single = TextAnalysis.decontaminate(docs, evalSource = "src19")
      .filter($"source" =!= "src18")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(slice19 == single)
    // a doc contaminated by both benchmarks appears once per eval source
    assert(report.groupBy($"doc_id", $"source", $"eval_source").count()
      .filter($"count" > 1).count() == 0)
  }

  test("misraGries: every item above the n/m threshold survives a partition stream") {
    // 3 heavy items (freq 100) buried in 2000 distinct singletons, m=64:
    // threshold n/m = 2300/64 ≈ 36 < 100, so all three MUST be candidates.
    val rnd = new scala.util.Random(11)
    val stream = rnd.shuffle(
      Seq("hh a", "hh b", "hh c").flatMap(h => Seq.fill(100)(h)) ++
        (0 until 2000).map(i => s"noise $i"))
    val out = graft.ops.TextAnalysis.misraGries(stream.iterator, 64).toSet
    assert(Set("hh a", "hh b", "hh c").subsetOf(out))
    assert(out.size <= 64)
  }

  test("ngramStatsSketch equals the exact top-k on skewed data and on the corpus") {
    // synthetic skew: 5 planted boilerplate trigram docs repeated heavily,
    // long tail of unique docs — repartitioned so MG runs per-partition
    val heavy = (0 until 5).flatMap(h =>
      (0 until 40).map(r => (h * 1000L + r, s"planted boiler text number $h end")))
    val tail = (0 until 800).map(i => (100000L + i, s"unique tail doc $i about topic $i"))
    val skewed = (heavy ++ tail).toDF("doc_id", "text").repartition(8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows(graft.ops.TextAnalysis.ngramStatsSketch(skewed, k = 10, m = 256)) ==
      rows(graft.ops.TextAnalysis.ngramStats(skewed, k = 10)))
    // and on the real test corpus at the shipped defaults
    assert(rows(graft.ops.TextAnalysis.ngramStatsSketch(docs)) ==
      rows(graft.ops.TextAnalysis.ngramStats(docs)))
  }

  test("t_ngram_topk oracle regime: verify-scale corpora stay eviction-free at default m") {
    // The t_ngram_topk ORACLE equality is unconditional only while no MG
    // eviction happens anywhere. Guard: GLOBAL distinct shingles < m
    // implies per-partition distinct < m under ANY partitioning, so the
    // gate cannot flip on a partition-count change. If a testdata regen
    // breaks this, this spec fails loudly instead of the oracle flaking.
    val m = 1 << 16
    for (dir <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val distinct = graft.ops.Dedup.shingled(Tables(spark, dir).documents)
        .select(explode($"shingles").as("s")).distinct().count()
      assert(distinct < m,
        s"$dir has $distinct distinct shingles >= m=$m: t_ngram_topk oracle " +
          "equality is no longer partition-independent — raise m or demote the key")
    }
  }

  test("fingerprint: invariant to case, punctuation and whitespace") {
    val out = TextAnalysis.fingerprint(Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO-WORLD"), (4L, "other")
    ).toDF("doc_id", "text")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L) && out(1L) != out(4L))
  }

  test("repetition: kernel counts trigrams with multiplicity, flags loops") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),  // one trigram repeated
      (2L, "a b a b a b"),                               // total 4, distinct 2, max 2
      (3L, "all tokens here are fully distinct words"),  // no repetition
      (4L, "too short")                                  // < 3 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(4L))
    assert(out(1L).getAs[Int]("n_trigrams") == 6 && out(1L).getAs[Int]("n_distinct") == 1)
    assert(out(1L).getAs[String]("rep_flag") == "repetitive")
    assert(out(2L).getAs[Int]("n_trigrams") == 4 && out(2L).getAs[Int]("n_distinct") == 2
      && out(2L).getAs[Int]("max_freq") == 2)
    assert(out(3L).getAs[Double]("dup_ratio") == 0.0)
    assert(out(3L).getAs[String]("rep_flag") == "ok")
    // scan-side kernel: no explode/shuffle in the plan
    val plan = TextAnalysis.repetition(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"), plan)
  }

  test("lexicalDiversity: TTR counts distinct tokens once, flags templated text") {
    val df = Seq(
      (1L, "The the THE cat"),                            // 4 tokens, 2 distinct (case-folded)
      (2L, ""),                                           // empty → 0 tokens, ttr 0
      (3L, Seq.fill(20)("buy now").mkString(" ")),        // 40 tokens, 2 distinct → templated
      (4L, (1 to 25).map(i => s"w$i").mkString(" "))      // fully distinct → ok
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_tokens") == 4 && out(1L).getAs[Int]("n_distinct") == 2)
    assert(out(1L).getAs[Double]("ttr") == 0.5)
    assert(out(2L).getAs[Int]("n_tokens") == 0 && out(2L).getAs[Double]("ttr") == 0.0)
    assert(out(3L).getAs[String]("div_flag") == "templated")
    assert(out(4L).getAs[Double]("ttr") == 1.0 && out(4L).getAs[String]("div_flag") == "ok")
    // scan-side kernel: no shuffle, no explode, codegen stage (parquet
    // input — a literal frame constant-folds to LocalTableScan)
    val q = TextAnalysis.lexicalDiversity(docs)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"), plan)
    val line = plan.linesIterator.find(_.contains("graft_ttr_profile"))
    assert(line.isDefined && line.get.trim.stripPrefix("+- ").startsWith("*"),
      s"graft_ttr_profile not in a codegen stage:\n$plan")
  }

  test("piiScrub: redacts emails/phones/IPs, counts match, md5 reflects scrubbed text") {
    val df = Seq(
      (1L, "contact bob@example.com or alice@test.org today"),
      (2L, "call 555-123-4567 from 10.0.0.1 please"),
      (3L, "no pii in this text at all"),
      (4L, "reach 555-123-4567@corp.net now") // phone-shaped local part
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_email") == 2 && out(1L).getAs[Int]("n_phone") == 0)
    assert(out(2L).getAs[Int]("n_phone") == 1 && out(2L).getAs[Int]("n_ip") == 1)
    assert(out(3L).getAs[Int]("n_email") + out(3L).getAs[Int]("n_phone")
      + out(3L).getAs[Int]("n_ip") == 0)
    // the scrubbed md5 equals md5 of the placeholder-substituted text
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L).getAs[String]("clean_md5") == m("contact <email> or <email> today"))
    assert(out(2L).getAs[String]("clean_md5") == m("call <phone> from <ip> please"))
    assert(out(3L).getAs[String]("clean_md5") == m("no pii in this text at all"))
    // sequential counts: the email scrub consumed the phone-shaped local
    // part, so no phantom phone redaction is reported
    assert(out(4L).getAs[Int]("n_email") == 1 && out(4L).getAs[Int]("n_phone") == 0)
    assert(out(4L).getAs[String]("clean_md5") == m("reach <email> now"))
  }

  test("decontaminate: flags corpus docs sharing trigrams with the eval set") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "train"),
      (2L, "completely unrelated corpus text goes here now", "train"),
      (3L, "benchmark says the quick brown fox jumps high", "eval"),
      (4L, "another benchmark question entirely", "eval")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.decontaminate(df, evalSource = "eval", minHits = 2).collect()
    // doc 1 shares "the quick brown"/"quick brown fox"/"brown fox jumps" with doc 3
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_id") == 1L)
    assert(out(0).getAs[Long]("n_hits") == 3L)
    // eval docs themselves are never flagged
    assert(!out.exists(_.getAs[String]("source") == "eval"))
  }

  test("decontamCurve: hand-computed flag counts per threshold; monotone nonincreasing; planted 1/32 tie rounds half-away") {
    import graft.ops.TextAnalysis
    // eval doc shingles: {a b c, b c d}; corpus doc 1 shares ONE
    // ("a b c"), doc 2 shares TWO; 30 disjoint fillers → 32 corpus docs
    val fillers = (10L until 40L).map(i => (i, s"f$i g$i h$i", "train"))
    val df = (Seq(
      (1L, "a b c x", "train"),
      (2L, "a b c d", "train"),
      (3L, "a b c d", "eval")) ++ fillers).toDF("doc_id", "text", "source")
    val got = TextAnalysis.decontamCurve(df, evalSource = "eval",
      thresholds = Seq(1, 2, 4)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // k=1 flags both sharers: 2/32 = 0.0625 (exact at the 4th decimal);
    // k=2 flags only doc 2: 1/32 = 0.03125 — the …5 tie must round AWAY
    assert(got(1) == ((2L, 32L, 0.0625)), s"k=1: ${got(1)}")
    assert(got(2) == ((1L, 32L, 0.0313)), s"k=2: ${got(2)}")
    assert(got(4) == ((0L, 32L, 0.0)), s"k=4: ${got(4)}")
    // the curve is monotone nonincreasing in the threshold by definition
    assert(got(1)._1 >= got(2)._1 && got(2)._1 >= got(4)._1)
  }

  test("qualityCurve: keep counts equal filterPipeline's per threshold; monotone; planted 1/32 tie rounds half-away") {
    import graft.ops.TextAnalysis
    // one genuine keep (16 diverse tokens incl. stopwords) among 31
    // three-token fillers (too_short at every panel threshold)
    val keepText = "the quick brown fox jumps over a lazy dog while people watch birds near rivers today"
    val fillers = (10L until 41L).map(i => (i, s"f$i g$i h$i", "web"))
    val df = (Seq((1L, keepText, "web")) ++ fillers).toDF("doc_id", "text", "source")
    val got = TextAnalysis.qualityCurve(df, minTokensPanel = Seq(10, 20)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // k=10 keeps exactly the planted doc: 1/32 = 0.03125 — the …5 tie
    // must round AWAY; its 16 tokens are the retained token mass
    assert(got(10) == ((1L, 32L, 0.0313, 16L)), s"k=10: ${got(10)}")
    // k=20 starves even the planted doc (16 < 20)
    assert(got(20) == ((0L, 32L, 0.0, 0L)), s"k=20: ${got(20)}")
    // on the real corpus, the curve is filterPipeline's keep count at
    // every panel threshold (the sweep sweeps what the filter enforces)
    val panel = Seq(10, 20, 50, 100)
    val curve = TextAnalysis.qualityCurve(docs, minTokensPanel = panel).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    panel.foreach { k =>
      val keeps = TextAnalysis.filterPipeline(docs, minTokens = k)
        .filter($"verdict" === "keep")
      assert(curve(k)._1 == keeps.count(), s"k=$k keep count")
      assert(curve(k)._3 == {
        import org.apache.spark.sql.functions.{coalesce, lit, sum}
        keeps.agg(coalesce(sum($"n_tokens".cast("long")), lit(0L)))
          .collect()(0).getLong(0)
      }, s"k=$k token mass")
      assert(curve(k)._2 == docs.count())
    }
    // monotone nonincreasing in the threshold by definition
    val ks = panel.map(k => curve(k)._1)
    assert(ks.zip(ks.tail).forall { case (a, b) => a >= b }, s"keeps $ks")
  }

  test("decontaminateBloom: equals the exact path (no false negatives, FPs verified away)") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_hits"))
    // handcrafted corpus (incl. the planted contamination above)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "train"),
      (2L, "completely unrelated corpus text goes here now", "train"),
      (3L, "benchmark says the quick brown fox jumps high", "eval"),
      (4L, "another benchmark question entirely", "eval")
    ).toDF("doc_id", "text", "source")
    assert(TextAnalysis.decontaminateBloom(df, evalSource = "eval", minHits = 2)
      .collect().map(key).toSet ==
      TextAnalysis.decontaminate(df, evalSource = "eval", minHits = 2)
        .collect().map(key).toSet)
    // and on the full test corpus — including an UNDERSIZED sketch whose
    // high fpp floods the prefilter with false positives: the verify
    // join must still reduce to the exact answer
    val exact = TextAnalysis.decontaminate(docs).collect().map(key).toSet
    assert(exact.nonEmpty)
    assert(TextAnalysis.decontaminateBloom(docs).collect().map(key).toSet == exact)
    assert(TextAnalysis.decontaminateBloom(docs, estimatedItems = 64, numBits = 256)
      .collect().map(key).toSet == exact)
    // empty eval set: no hits, clean empty result
    assert(TextAnalysis.decontaminateBloom(df, evalSource = "nosuch").collect().isEmpty)
  }

  test("multimodal: binary assembly round-trips and decode features are consistent") {
    val media = Multimodal.assemble(docs)
    assert(media.schema("bytes").dataType.typeName == "binary")
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == docs.count())
    decoded.foreach { d =>
      assert(d.feature == (d.n_bytes.toLong * 31L + d.doc_id) % 997L)
      assert(d.content_md5.length == 32)
      assert(Set("image", "audio", "video")(d.media_type))
    }
    // metadata-only access must not require decoding: schema pruning check
    val widths = media.select("width").limit(5).collect()
    assert(widths.forall(_.getInt(0) >= 64))
  }

  test("multimodal resize: payload shrinks with target area, metadata updated") {
    val media = Multimodal.assemble(docs)
    val resized = Multimodal.resize(media, 64, 64).collect()
    val orig = media.collect().map(r => r.doc_id -> r).toMap
    resized.foreach { r =>
      val o = orig(r.doc_id)
      assert(r.width == 64 && r.height == 64 && r.media_type == o.media_type)
      val expectN = math.min(o.bytes.length.toLong,
        (o.bytes.length.toLong * 4096 + o.width.toLong * o.height - 1) / (o.width.toLong * o.height)).toInt
      assert(r.bytes.length == expectN)
      assert(r.bytes.sameElements(o.bytes.take(expectN)), s"doc ${r.doc_id} not a prefix")
    }
    // resize to each record's OWN box is identity on the payload
    import spark.implicits._
    val identity = media.limit(20).collect().map { o =>
      val r = Multimodal.resizeStub(o, o.width, o.height)
      assert(r.bytes.sameElements(o.bytes), s"doc ${o.doc_id}: own-box resize must be identity")
      r
    }
    assert(identity.nonEmpty)
  }

  test("multimodal frame sampling: every k-th frame, correct sizes, payload chunks") {
    val media = Multimodal.assemble(docs.limit(20))
    val frames = Multimodal.sampleFrames(media, frameSize = 256, every = 4).collect()
    val orig = media.collect().map(r => r.doc_id -> r.bytes).toMap
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.frame_index % 4 == 0)
      val bytes = orig(f.doc_id)
      val from = f.frame_index * 256
      val until = math.min(bytes.length, from + 256)
      assert(f.n_bytes == until - from)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(java.util.Arrays.copyOfRange(bytes, from, until))
        .map("%02x".format(_)).mkString
      assert(f.frame_md5 == expect)
    }
    // coverage: every doc with a payload contributes its frame 0
    assert(frames.count(_.frame_index == 0) == orig.count(_._2.nonEmpty))
  }

  test("scan-side keys prune the parquet read to exactly the columns they use") {
    val expect = Map(
      "m_frames"     -> "struct<doc_id:bigint,text:string>",
      "t_pii_scrub"  -> "struct<doc_id:bigint,text:string>",
      "d_sample_mix" -> "struct<doc_id:bigint,source:string>")
    for ((key, schema) <- expect) {
      val df = SparkEntry.queries(key)(spark, TestSpark.sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(s"ReadSchema: $schema"),
        s"$key should scan only $schema:\n$plan")
    }
  }

  test("multimodal payloadDedup: byte-identical media collapse, min doc_id keeps") {
    import graft.ops.Multimodal
    val dupes = Seq((7L, "same payload"), (3L, "same payload"), (9L, "unique payload"))
      .toDF("doc_id", "text")
    val out = Multimodal.payloadDedup(dupes).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(3L -> 2L, 9L -> 1L))
    // corpus-level: group count equals distinct payload hashes, groups cover all docs
    val corpus = Multimodal.payloadDedup(docs)
    assert(corpus.agg(sum($"n_copies")).collect()(0).getLong(0) == docs.count())
  }

  test("lmScore hand example: in-corpus bigram probabilities, exact means, short docs excluded") {
    // corpus: "a b a b" + "a b c" → C(a b)=3, C(b a)=1, C(b c)=1; C(a ·)=3, C(b ·)=2
    // doc1 logprobs: ln(3/3), ln(1/2), ln(3/3) → mean = ln(1/2)/3 = -0.2310
    // doc2 logprobs: ln(3/3), ln(1/2)          → mean = ln(1/2)/2 = -0.3466
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"), (4L, ""), (5L, null: String))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"), r.getAs[String]("lm_bucket"))).toMap
    assert(out.keySet == Set(1L, 2L), "docs with < 2 tokens have no bigrams and are excluded")
    assert(out(1L) == ((3L, -0.231, "fluent")))
    assert(out(2L) == ((2L, -0.3466, "fluent")))
  }

  test("lmScore corpus invariants: coverage, bounds, bucket consistency, partition-invariant") {
    val out = TextAnalysis.lmScore(docs)
    val scoreable = docs.filter(size(split(trim(coalesce(col("text"), lit(""))), "\\s+")) >= 2).count()
    assert(out.count() == scoreable)
    val rows = out.collect()
    rows.foreach { r =>
      val (lp, b) = (r.getAs[Double]("avg_logprob"), r.getAs[String]("lm_bucket"))
      assert(lp <= 0.0, "log-probabilities are never positive")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      val expect = if (lp >= -3.37) "fluent" else if (lp >= -3.40) "typical" else "surprising"
      assert(b == expect)
    }
    // model is global: scoring must not depend on input partitioning
    val again = TextAnalysis.lmScore(docs.repartition(17)).collect().map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
  }

  test("decontamScrub hand example: eval spans removed surgically, clean content survives") {
    val evalSpan = "e1 e2 e3 e4 e5 e6 e7 e8"           // exactly one 8-token span
    val cleanA = "c1 c2 c3 c4 c5 c6 c7 c8"
    val df = Seq(
      (1L, "src19", evalSpan),                          // the eval doc
      (10L, "web", s"$evalSpan $cleanA"),               // quotes the benchmark + clean content
      (11L, "web", evalSpan),                           // fully contaminated
      (12L, "web", "x1 x2 x3 x4 x5 x6 x7 x8")           // clean
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.decontamScrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Int]("n_kept"), r.getAs[Int]("n_dropped"))).toMap
    assert(out.keySet == Set(10L, 12L), "fully-contaminated docs vanish; eval docs are never output")
    assert(out(10L) == ((cleanA, 1, 1)), "the quoted span is removed, the clean span kept")
    assert(out(12L) == (("x1 x2 x3 x4 x5 x6 x7 x8", 1, 0)), "clean docs pass through intact")
  }

  test("boilerplateScrub hand example: df>=3 spans removed from EVERY doc, including the first") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"             // exactly one 8-token span
    val twice = "t1 t2 t3 t4 t5 t6 t7 t8"              // df = 2: under the threshold
    val df = Seq(
      (1L, "web", s"$boiler u1 u2 u3 u4 u5 u6 u7 u8"), // first occurrence — still scrubbed
      (2L, "web", boiler),                             // all-boilerplate: vanishes
      (3L, "web", s"$boiler $twice"),
      (4L, "web", twice),
      // same span twice in ONE doc: occurrences 2, distinct docs 1 — kept
      (5L, "web", "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.boilerplateScrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Int]("n_kept"), r.getAs[Int]("n_dropped"))).toMap
    assert(out.keySet == Set(1L, 3L, 4L, 5L), "the all-boilerplate doc vanishes")
    assert(out(1L) == (("u1 u2 u3 u4 u5 u6 u7 u8", 1, 1)), "first occurrence is scrubbed too")
    assert(out(3L) == ((twice, 1, 1)))
    assert(out(4L) == ((twice, 1, 0)), "df=2 spans survive everywhere")
    assert(out(5L)._2 == 2, "within-doc repetition does not count toward df")
  }

  test("boilerplateScrub corpus: dropped spans equal an independent df>=3 occurrence count") {
    import graft.ops.Dedup
    val out = TextAnalysis.boilerplateScrub(docs).collect()
    val spans = Dedup.spanCut(docs, 8)
      .select("doc_id", "span").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("span")))
    val dfBySpan = spans.groupBy(_._2).map { case (s, occ) => s -> occ.map(_._1).distinct.size }
    val boilerOccurrences = spans.count { case (_, s) => dfBySpan(s) >= 3 }
    assert(boilerOccurrences > 0, "testdata must exercise the scrub (live signal)")
    assert(out.map(_.getAs[Int]("n_dropped")).sum == boilerOccurrences)
    out.foreach { r =>
      assert(r.getAs[Int]("n_kept") + r.getAs[Int]("n_dropped") == r.getAs[Int]("n_spans"))
    }
  }

  test("decontamScrub corpus: dropped spans equal an independent overlap count; clean docs intact") {
    import graft.ops.Dedup
    val out = TextAnalysis.decontamScrub(docs).collect()
    // independent count of contaminated corpus spans
    val evalSpans = Dedup.spanCut(docs.filter(col("source") === "src19"), 8)
      .select("span").distinct().collect().map(_.getString(0)).toSet
    val corpusSpans = Dedup.spanCut(docs.filter(col("source") =!= "src19"), 8)
      .select("span").collect().map(_.getString(0))
    val contaminated = corpusSpans.count(evalSpans.contains)
    assert(contaminated > 0, "testdata must exercise the scrub (live signal)")
    assert(out.map(_.getAs[Int]("n_dropped")).sum == contaminated)
    out.foreach { r =>
      assert(r.getAs[Int]("n_kept") + r.getAs[Int]("n_dropped") == r.getAs[Int]("n_spans"))
      assert(r.getAs[String]("source") != "src19")
    }
    // untouched docs keep their exact normalized text
    val normByDoc = docs.filter(col("source") =!= "src19")
      .select(col("doc_id"), lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t")).toMap
    out.filter(_.getAs[Int]("n_dropped") == 0).foreach { r =>
      assert(r.getAs[String]("clean_text") == normByDoc(r.getAs[Long]("doc_id")))
    }
  }

  test("sourceOverlap hand example: shared distinct shingles and jaccard per source pair") {
    // s1 docs: "a b c d" → {abc, bcd}; "a b c" → {abc}  ⇒ s1 set = {abc, bcd}
    // s2 doc:  "a b c x" → {abc, bcx}                   ⇒ shared {abc}: J = 1/3
    // s3 doc:  "p q r s" → {pqr, qrs}                   ⇒ disjoint: no row
    val df = Seq((1L, "s1", "a b c d"), (2L, "s1", "a b c"),
      (3L, "s2", "a b c x"), (4L, "s3", "p q r s")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceOverlap(df).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Double]("jaccard"))).toMap
    assert(out.keySet == Set(("s1", "s2")), "disjoint pairs emit no row")
    assert(out(("s1", "s2")) == ((1L, 2L, 2L, 0.3333)))
  }

  test("sourceOverlap corpus invariants: a<b only, bounds, shared counts consistent") {
    val rows = TextAnalysis.sourceOverlap(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val (sh, na, nb) = (r.getAs[Long]("n_shared"), r.getAs[Long]("na"), r.getAs[Long]("nb"))
      val j = r.getAs[Double]("jaccard")
      assert(a < b, "pairs are emitted once, lexicographically ordered")
      assert(sh >= 1 && sh <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
      assert(math.abs(j - BigDecimal(sh.toDouble / (na + nb - sh))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // per-source set sizes match an independent distinct count
    val sizes = docs.select(col("source"),
        explode(graft.functions.GraftFunctions.shingles(col("text"))).as("g"))
      .distinct().groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("na") == sizes(r.getAs[String]("source_a")))
      assert(r.getAs[Long]("nb") == sizes(r.getAs[String]("source_b")))
    }
  }

  test("phashNearDup: planted near-dups found, pair set equals brute force over md5-representatives") {
    import graft.functions.TextKernels
    val base = "the quick brown fox jumps over the lazy dog " * 8 // 360 ASCII chars
    val swap = "" + base(1) + base(0) + base.substring(2)         // same-block swap: identical phash
    val tweak = base.substring(0, base.length - 1) + (base.last + 1).toChar // one byte ±1: tiny hamming
    val ortho = Array.tabulate(400)(i => (33 + (i * 7) % 94).toChar).mkString // unrelated block profile
    val dupe = base                                               // exact copy: collapses into doc 1
    val corpus = Seq((1L, base), (2L, swap), (3L, tweak), (4L, ortho), (5L, dupe))
    val media = corpus.toDF("doc_id", "text")
      .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("bytes"))
    val got = Multimodal.phashNearDup(media).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming"))).toSet

    // brute force over min-doc_id representatives of each exact-dup class
    val reps = corpus.groupBy(_._2).map { case (_, grp) => grp.minBy(_._1) }.toSeq
    val ph = reps.map { case (id, t) => id -> TextKernels.phash64(t.getBytes("UTF-8")) }.toMap
    val ids = reps.map(_._1).sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(ph(ids(i)) ^ ph(ids(j))) if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    assert(got == expected)
    // construction checks: the planted pairs are really in radius, the foils really out
    assert(ph(1L) == ph(2L), "same-block swap must preserve every block sum")
    assert(got.contains((1L, 2L, 0)))
    val hTweak = java.lang.Long.bitCount(ph(1L) ^ ph(3L))
    assert(hTweak <= 3, s"last-byte tweak drifted out of radius: $hTweak")
    assert(got.contains((1L, 3L, hTweak)))
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(4L)) > 3, "orthogonal payload must be out of radius")
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L),
      "collapsed non-representative must never appear in pairs")
    // the 4-band pigeonhole argument only covers radius <= 3
    intercept[IllegalArgumentException](Multimodal.phashNearDup(media, maxHamming = 4))
  }

  test("phashCurve: cumulative pair/doc counts per radius match brute force; monotone nondecreasing") {
    import graft.functions.TextKernels
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val swap = "" + base(1) + base(0) + base.substring(2)         // hamming 0 to base
    // find a single-character tweak at hamming 1..3 deterministically
    // (a ±1 byte can vanish into the block sums — search instead)
    val basePh = TextKernels.phash64(base.getBytes("UTF-8"))
    val tweak = (for {
      pos <- base.indices.iterator
      ch <- (33 to 126).iterator.map(_.toChar) if ch != base(pos)
      cand = base.updated(pos, ch)
      h = java.lang.Long.bitCount(basePh ^ TextKernels.phash64(cand.getBytes("UTF-8")))
      if h >= 1 && h <= 3
    } yield cand).next()
    val ortho = Array.tabulate(400)(i => (33 + (i * 7) % 94).toChar).mkString
    val corpus = Seq((1L, base), (2L, swap), (3L, tweak), (4L, ortho))
    val media = corpus.toDF("doc_id", "text")
      .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("bytes"))
    val got = Multimodal.phashCurve(media).collect()
      .map(r => r.getAs[Int]("max_hamming") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs")))).toMap
    // brute-force reference per radius
    val ph = corpus.map { case (id, t) => id -> TextKernels.phash64(t.getBytes("UTF-8")) }.toMap
    val ids = corpus.map(_._1).sorted
    def ref(r: Int) = {
      val ps = for {
        i <- ids.indices; j <- (i + 1) until ids.length
        if java.lang.Long.bitCount(ph(ids(i)) ^ ph(ids(j))) <= r
      } yield (ids(i), ids(j))
      (ps.size.toLong, ps.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }
    (0 to 3).foreach(r => assert(got(r) == ref(r), s"radius $r: ${got(r)} vs ${ref(r)}"))
    // the curve is cumulative by construction
    val ordered = (0 to 3).map(got)
    assert(ordered.zip(ordered.tail).forall { case ((p1, d1), (p2, d2)) => p1 <= p2 && d1 <= d2 })
    // the fixture really exercises it: radius 0 has the block-swap pair,
    // radius 3 has the tweak pair too, ortho never joins
    assert(got(0)._1 >= 1L && got(3)._1 > got(0)._1 && got(3)._2 == 3L)
  }

  test("phashClusters: a re-encode CHAIN collapses to one cluster; singletons omitted; id = min member") {
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val swap12 = "" + base(1) + base(0) + base.substring(2)            // same-block swap of bytes 0,1
    val swap34 = base.substring(0, 2) + base(3) + base(2) + base.substring(4) // same-block swap of bytes 2,3
    val ortho = Array.tabulate(400)(i => (33 + (i * 7) % 94).toChar).mkString
    val media = Seq((1L, base), (2L, swap12), (3L, swap34), (4L, ortho))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(coalesce(col("text"), lit("")), "UTF-8").as("bytes"))
    val out = Multimodal.phashClusters(media).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_media")))
    // 1≈2 and 1≈3 (identical fingerprints) chain into ONE cluster of 3,
    // rooted at the min member; the orthogonal payload is a singleton → omitted
    assert(out.toSeq == Seq((1L, 3L)), s"got ${out.toSeq}")
    // corpus scale: every planted (doc, doc+10M) pair lands in a shared
    // cluster and every emitted cluster has ≥ 2 members
    val corpus = Multimodal.mediaWithPlantedNearDups(docs)
    val pairs = Multimodal.phashNearDup(corpus).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clusters = Multimodal.phashClusters(corpus).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_media")))
    assert(clusters.forall(_._2 >= 2L))
    assert(clusters.map(_._2).sum == (pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong),
      "cluster membership must cover exactly the pair endpoints")
  }

  test("m_phash_neardup key: planted variants pair at verify scale, equals brute force") {
    import graft.functions.TextKernels
    val out = SparkEntry.queries("m_phash_neardup")(spark, TestSpark.sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    assert(out.nonEmpty, "verify-scale output must be a live signal, not empty")
    // every eligible doc's swap variant lands at hamming 0
    val t = coalesce(col("text"), lit(""))
    val eligible = docs.filter(col("doc_id") % 41 === 0 && length(t) > 64 &&
        substring(t, 1, 1) =!= substring(t, 2, 1))
      .select("doc_id").collect().map(_.getLong(0))
    assert(eligible.nonEmpty)
    eligible.foreach { id =>
      assert(out.exists(p => p._2 == id + 10000000L && p._3 == 0),
        s"planted swap pair for doc $id missing")
    }
    // full brute force over the derived corpus' md5-representatives
    val media = Multimodal.mediaWithPlantedNearDups(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("bytes"))
      .filter(_._2.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val reps = media.groupBy { case (_, bs) => md.digest(bs).toSeq }
      .map { case (_, grp) => grp.minBy(_._1) }.toSeq
    val ph = reps.map { case (id, bs) => id -> TextKernels.phash64(bs) }.toMap
    val ids = reps.map(_._1).sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(ph(ids(i)) ^ ph(ids(j))) if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    assert(out.toSet == expected)
  }

  test("tokenEntropy: hand-computed values; single-type → 0; uniform → norm 1; blank dropped") {
    val df = Seq(
      (1L, "a a a a"),       // one type: H = 0, norm 0 by convention
      (2L, "a b c d"),       // uniform: H = ln 4, norm 1
      (3L, "a a b"),         // H = ln 3 − (2·ln 2)/3 ≈ 0.6365
      (4L, "   ")            // blank: dropped by the non-empty filter
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    val r1 = out(1L)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 1)
    assert(r1.getDouble(3) == 0.0 && r1.getDouble(4) == 0.0)
    val r2 = out(2L)
    assert(r2.getLong(1) == 4 && r2.getLong(2) == 4)
    assert(r2.getDouble(3) == 1.3863 && r2.getDouble(4) == 1.0)
    val r3 = out(3L)
    assert(r3.getLong(1) == 3 && r3.getLong(2) == 2)
    assert(r3.getDouble(3) == 0.6365 && r3.getDouble(4) == 0.9183)
  }

  test("vocabCoverage: OOV vs the top-V corpus vocab; frequency tie broken by token asc") {
    // corpus freqs: a:3, b:2, c:1, d:1
    val df = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L) // vocab {a,b}: c is OOV → 1/4
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 1 && r1.getDouble(3) == 0.25)
    val r2 = out(2L) // d is OOV → 1/3
    assert(r2.getLong(1) == 3 && r2.getLong(2) == 1 && r2.getDouble(3) == 0.3333)
    // c and d tie at freq 1: vocabSize=3 admits 'c' (token asc), not 'd'
    val out3 = TextAnalysis.vocabCoverage(df, vocabSize = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out3(1L).getLong(2) == 0 && out3(2L).getLong(2) == 1)
  }

  test("gopherRules: every verdict arm fires on its planted document, in rule order") {
    val w4 = (1 to 25).map(i => f"wd$i%02d").mkString(" ") // 25 4+-char alpha words
    val df = Seq(
      (1L, "too few words here"),                                     // 4 words
      (2L, (1 to 85).map(i => f"wd$i%02d").mkString(" ")),            // 85 words
      (3L, (1 to 25).map(_ => "abcdefghijkl").mkString(" ")),         // mean len 12
      (4L, w4 + " # # #"),                                            // 3/28 symbols
      (5L, (1 to 10).map(_ => "- abcdefgh").mkString("\n")),          // all bullet lines
      (6L, (1 to 4).map(_ => ("abcd " * 11) + "abcd...").mkString("\n")), // ellipsis ends
      (7L, (1 to 21).map(_ => "1234").mkString(" ") + " " + "abcd abcd abcd abcd"), // 4/25 alpha
      (8L, (1 to 25).map(_ => "zyxw").mkString(" ")),                 // no stopwords
      (9L, "the cat and " + w4 + " of dog")                           // keep
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = TextAnalysis.gopherRules(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == Map(1L -> "too_few_words", 2L -> "too_many_words",
      3L -> "word_length", 4L -> "symbol_heavy", 5L -> "bullet_heavy",
      6L -> "ellipsis_heavy", 7L -> "low_alpha", 8L -> "few_stopwords",
      9L -> "keep"))
  }

  test("gopherRules: ratios bounded, verdicts exhaustive, count preserved on real docs") {
    val out = TextAnalysis.gopherRules(docs)
    assert(out.count() == docs.count())
    Seq("alpha_frac", "bullet_frac", "ellipsis_frac").foreach { c =>
      assert(out.filter(col(c) < 0 || col(c) > 1).count() == 0, c)
    }
    val verdicts = Set("too_few_words", "too_many_words", "word_length",
      "symbol_heavy", "bullet_heavy", "ellipsis_heavy", "low_alpha",
      "few_stopwords", "keep")
    assert(out.collect().forall(r => verdicts(r.getAs[String]("verdict"))))
  }

  test("readability: hand-computed Flesch and FK grade; zero-sentence guard") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "no terminal punctuation here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L) // 6 words, 2 sentences, 6 vowel groups → wps 3, spw 1
    assert(r1.getAs[Int]("n_words") == 6 && r1.getAs[Int]("n_sentences") == 2 &&
      r1.getAs[Int]("n_syllables") == 6)
    assert(r1.getAs[Double]("flesch") == 119.19)   // 206.835 − 3.045 − 84.6
    assert(r1.getAs[Double]("fk_grade") == -2.62)  // 1.17 + 11.8 − 15.59
    val r2 = got(2L) // sentences=0 → divisor 1
    assert(r2.getAs[Int]("n_sentences") == 0)
    assert(r2.getAs[Double]("flesch") ==
      math.rint((206.835 - 1.015 * 4 - 84.6 * (9.0 / 4)) * 10000) / 10000)
  }

  test("bpeMerges: hand-counted pair frequencies, multiplicity kept, no cross-word pairs") {
    val df = Seq((1L, "ab ab cd"), (2L, "abc")).toDF("doc_id", "text")
    // pairs: doc1 → a+b, a+b, c+d; doc2 → a+b, b+c
    val got = TextAnalysis.bpeMerges(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a+b", 3L), ("b+c", 1L), ("c+d", 1L)))
    // single-char words contribute nothing; "d c" never forms d+c across the space
    assert(TextAnalysis.bpeMerges(Seq((1L, "a b c d")).toDF("doc_id", "text")).count() == 0)
  }

  test("normalizeReport: NFC composition, control strip, whitespace collapse — hand-checked") {
    val nfd = "He\u0301llo"         // e + combining acute (6 codepoints)
    val nfc = "H\u00e9llo"          // é composed (5 codepoints)
    val df = Seq(
      (1L, "s", nfd + "\u0007 world"),      // NFD + BEL control
      (2L, "s", nfc + " world"),            // already canonical
      (3L, "s", "  a\t\tb\n\nc  "),         // whitespace mess
      (4L, "s", "clean text")               // untouched
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.normalizeReport(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5)))).toMap
    // doc1 and doc2 normalize to the SAME canonical text → same md5
    // (the fingerprint collision the stage exists to create)
    assert(out(1L)._4 == out(2L)._4)
    assert(out(1L)._3, "NFD + control input must report changed")
    assert(!out(2L)._3 && out(2L)._1 == out(2L)._2,
      "already-canonical text must be untouched")
    assert(out(2L)._2 == 11) // "Héllo world" = 11 codepoints
    // whitespace mess collapses to "a b c" (5 chars), changed
    assert(out(3L)._2 == 5 && out(3L)._3)
    assert(!out(4L)._3)
    // NULL text = empty doc, not a crash/drop
    val nullOut = TextAnalysis.normalizeReport(
      Seq((9L, "s")).toDF("doc_id", "source")
        .withColumn("text", lit(null).cast("string"))).collect()
    assert(nullOut.length == 1 && nullOut(0).getLong(3) == 0L)
  }

  test("bpeTrain: hand-traced merge rounds, greedy-leftmost overlap rule, partition-stable") {
    // corpus: "abab" ×3, "ab" ×2, "aaa" ×1
    // round 1: pairs a+b f=3·2+2=8, b+a f=3, a+a f=2 → merge (a,b)
    // round 2: syms abab→[ab,ab], ab→[ab], aaa→[a,a,a];
    //          pairs ab+ab f=3, a+a f=2 → merge (ab,ab)
    // round 3: abab→[abab]; remaining pairs a+a f=2 (aaa: leftmost pair
    //          only after merge → [aa,a]) → merge (a,a)
    // round 4: aaa→[aa,a] → pairs aa+a f=1 → merge (aa,a)
    // round 5: no pairs anywhere → training exhausts early
    val df = Seq((1L, "abab abab abab ab ab aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, rounds = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got == Seq((1, "a+b", 8L), (2, "ab+ab", 3L), (3, "a+a", 2L), (4, "aa+a", 1L)),
      s"got $got")
    // real corpus: deterministic under repartitioning, rounds distinct,
    // counts non-increasing is NOT required (re-segmentation can expose
    // new pairs), but every round must report a positive count
    val a = TextAnalysis.bpeTrain(docs, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    val b = TextAnalysis.bpeTrain(docs.repartition(7), rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(a == b, "merge table must be partition-stable")
    assert(a.map(_._1) == Seq(1, 2, 3, 4) && a.forall(_._3 > 0))
  }

  test("bpeApply: hand-traced token counts; NULL-text coverage row; bounded by chars and words on the real corpus") {
    // corpus: "aa aa b" + "aaa" — round 1 merges (a,a) (n = 2+2 = 4);
    // apply: "aa"→[aa] (1 tok ×2), "b"→[b] (1), "aaa"→greedy [aa,a] (2)
    val df = Seq((1L, "aa aa b"), (2L, "aaa"))
      .toDF("doc_id", "text")
      .unionByName(Seq(3L).toDF("doc_id").withColumn("text", lit(null).cast("string")))
    val got = TextAnalysis.bpeApply(df, rounds = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3L, 3L)), 2L -> ((1L, 2L)), 3L -> ((0L, 0L))),
      s"got $got")
    // real corpus invariants: merging only ever SHRINKS the char-level
    // segmentation and can never go below one token per word
    val applied = TextAnalysis.bpeApply(docs, rounds = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val charRef = docs
      .select(col("doc_id"), explode(split(norm, " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(applied.size == docs.count())
    charRef.foreach { case (id, (nw, nc)) =>
      val (gw, gt) = applied(id)
      assert(gw == nw, s"doc $id word count $gw != $nw")
      assert(gt >= nw && gt <= nc, s"doc $id tokens $gt outside [$nw, $nc]")
    }
    // some merge must actually fire corpus-wide
    assert(applied.values.map(_._2).sum < charRef.values.map(_._2).sum)
  }

  test("bpeApplyFromModel: out-of-vocabulary words still count and fall back to character-level tokens") {
    // model trained on "aa aa b"/"aaa" (round 1 merges (a,a)); served
    // against docs OUTSIDE the training corpus — the real serving case.
    // An unseen word gets no merges, so its segmentation IS its chars:
    // "zz aa q" → zz(2 chars, OOV) + aa(1 tok) + q(1 char, OOV) = (3, 4);
    // an all-OOV doc must read (1, 3), NOT the (0, 0) of an empty doc.
    val train = Seq((1L, "aa aa b"), (2L, "aaa")).toDF("doc_id", "text")
    val (_, syms) = TextAnalysis.bpeLoop(train, rounds = 1)
    val serve = Seq((10L, "zz aa q"), (11L, "xyz")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeApplyFromModel(serve, syms).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    syms.unpersist(blocking = false)
    assert(got == Map(10L -> ((3L, 4L)), 11L -> ((1L, 3L))), s"got $got")
  }

  test("corpusDrift: hand-computed shares and means; sources on one side only; planted 5th-decimal tie rounds half-away") {
    import graft.ops.TextAnalysis
    // T carries the tie: 32 docs, 4001 chars → mean 125.03125 exactly —
    // a ROUND(dbl, 4) would diverge cross-engine; the integer half-away
    // formula must read 125.0313 (the oracle mirrors the same formula)
    val tRows = (1 to 32).map(i => ("T", if (i == 1) 2 else 129))
    val prev = (Seq(("A", 10), ("A", 20), ("B", 7), ("D", 3)) ++ tRows)
      .toDF("source", "n_chars")                       // totals: 36 docs
    val cur = (Seq(("A", 10), ("A", 20), ("B", 7), ("B", 9), ("C", 5)) ++ tRows)
      .toDF("source", "n_chars")                       // totals: 37 docs
    val got = TextAnalysis.corpusDrift(prev, cur).collect()
      .map(r => r.getString(0) -> r).toMap
    def row(s: String) = {
      val r = got(s)
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    }
    // A: 2/36 → (40036 div 72 = 556) → 0.0556; 2/37 → 541 → 0.0541
    assert(row("A") == ((2L, 2L, 0L, 0.0556, 0.0541, 0.0541 - 0.0556, 15.0, 15.0)))
    // D exists only in prev: cur side reads 0 docs, 0.0 share/mean
    assert(row("D") == ((1L, 0L, -1L, 0.0278, 0.0, 0.0 - 0.0278, 3.0, 0.0)))
    // C exists only in cur
    assert(row("C") == ((0L, 1L, 1L, 0.0, 0.027, 0.027 - 0.0, 0.0, 5.0)))
    // the tie: 4001/32 = 125.03125 → half-away 125.0313 on BOTH sides
    assert(row("T")._7 == 125.0313 && row("T")._8 == 125.0313,
      s"tie must round half-away, got ${row("T")}")
    assert(got.size == 5)
  }

  test("bpeCurve: hand-traced totals per round incl. the exhaustion plateau; real-corpus curve monotone and consistent with bpeApply") {
    import graft.ops.TextAnalysis
    // "aa"(f=2) "ab"(f=1): r0 = chars (t=6); r1 merges (a,a) → t=4;
    // r2 merges (a,b) → t=3; then the pair supply is EXHAUSTED, so the
    // r=4 panel point must plateau at the final segmentation
    val df = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeCurve(df, rounds = 8, panel = Seq(0, 1, 2, 4)).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0) == ((6L, 3L, 2.0, 1.0)), s"r0: ${got(0)}")
    assert(got(1) == ((4L, 3L, 1.3333, 0.6667)), s"r1: ${got(1)}")
    assert(got(2) == ((3L, 3L, 1.0, 0.5)), s"r2: ${got(2)}")
    assert(got(4) == ((3L, 3L, 1.0, 0.5)), s"r4 (plateau): ${got(4)}")
    // real corpus: totals fall monotonically with merges, and the r=8
    // point IS bpeApply's corpus-wide token count (same model depth)
    val curve = TextAnalysis.bpeCurve(docs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ts = Seq(0, 2, 4, 8).map(r => curve(r)._1)
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b }, s"totals $ts")
    val applied = TextAnalysis.bpeApply(docs)
      .agg(org.apache.spark.sql.functions.sum($"n_bpe_tokens"),
        org.apache.spark.sql.functions.sum($"n_words")).collect()(0)
    assert(curve(8)._1 == applied.getLong(0), "r=8 total == bpeApply token mass")
    assert(curve(8)._2 == applied.getLong(1), "word instances agree")
  }

  test("bpeFertility: hand-computed fertility/OOV per source vs a snapshot-trained model; planted 5th-decimal ties; empty source") {
    import graft.ops.TextAnalysis
    // train on "yesterday": the only word is ab → one merge (a,b), vocab ab→1 token
    val prev = Seq(("X", "ab ab ab")).toDF("source", "text")
    val (_, syms) = TextAnalysis.bpeLoop(prev, 8)
    val cur = Seq(
      ("X", "ab ab ab"), ("X", "ab cd"),                  // cd is OOV → 2 char tokens
      ("Y", "xyz"),                                       // whole source OOV
      ("Z", (Seq.fill(31)("ab") :+ "qq").mkString(" ")),  // 33/32 and 1/32: exact …5 ties
      ("W", "")).toDF("source", "text")                   // no words at all
    val got = TextAnalysis.bpeFertility(cur, syms).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("X") == ((2L, 5L, 1L, 6L, 1.2, 0.2)), s"X: ${got("X")}")
    assert(got("Y") == ((1L, 1L, 1L, 3L, 3.0, 1.0)), s"Y: ${got("Y")}")
    // the ties: 33/32 = 1.03125 and 1/32 = 0.03125 must round half-AWAY
    assert(got("Z") == ((1L, 32L, 1L, 33L, 1.0313, 0.0313)), s"Z: ${got("Z")}")
    assert(got("W") == ((1L, 0L, 0L, 0L, 0.0, 0.0)), s"W: ${got("W")}")
    assert(got.size == 4)
    syms.unpersist(blocking = false)
  }

  test("winnow: hand-computed single-window fingerprint; shared-run guarantee; short docs empty") {
    import graft.ops.TextAnalysis
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 6 tokens, k=3 → 4 grams, w=4 → exactly one window: fp = min of the 4 gram md5s
    val df1 = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(df1).collect().map(_.getString(1))
    val expected = Seq("a b c", "b c d", "c d e", "d e f").map(md5hex).min
    assert(got.toSeq == Seq(expected))
    // any shared run of ≥ k+w−1 = 6 tokens shares at least one fingerprint
    val df2 = Seq(
      (1L, "x1 x2 a b c d e f y9"),
      (2L, "z7 a b c d e f")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df2).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    // < k+w−1 tokens → no full window → nothing emitted
    assert(TextAnalysis.winnowFingerprints(
      Seq((1L, "a b c d e")).toDF("doc_id", "text")).count() == 0)
  }

  test("langConfusion: hand matrix — counts and within-language shares") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "en", "the cat and the dog"),
      (2L, "en", "xyzzy qwerty"),
      (3L, "de", "der hund und die katze")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.langConfusion(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("en", "en") -> ((1L, 0.5)),
      ("en", "unknown") -> ((1L, 0.5)),
      ("de", "de") -> ((1L, 1.0))))
  }

  test("codeDetect: code, mixed, and prose arms fire on planted documents") {
    val code = (1 to 6).map(_ => "def f(x): return x(1);").mkString("\n  ")
    val df = Seq(
      (1L, code),                                            // symbols + keywords
      (2L, "if the weather is good then we will return home to dinner and a rest"), // keywords + stopwords, frac ≤ 0.15
      (3L, "plain ordinary sentences about nothing much at all")              // prose
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = TextAnalysis.codeDetect(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == Map(1L -> "code", 2L -> "mixed", 3L -> "prose"))
  }

  test("sourceOutliers: JVM differential on the quantized-integer z-score") {
    val out = TextAnalysis.sourceOutliers(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // recompute from the report's own exact integers
    val ms = out.map { case (_, nDocs, total, _, _) =>
      math.rint(total.toDouble / nDocs * 10000).toLong }
    // note: rint is HALF_EVEN vs the engine's HALF_UP — ties at the 4th
    // decimal of a mean are absent in this corpus (asserted below)
    out.zip(ms).foreach { case ((_, nDocs, total, mean, _), m) =>
      assert(math.abs(total.toDouble / nDocs * 10000 - m.toDouble) != 0.5)
    }
    val n = ms.length
    val mu = ms.sum.toDouble / n
    val m2 = ms.map(m => m * m).sum.toDouble / n
    val sigma = math.sqrt(math.max(m2 - mu * mu, 0.0))
    def r4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    out.zip(ms).foreach { case ((_, _, _, _, z), m) =>
      val expect = if (sigma == 0.0) 0.0 else r4((m - mu) / sigma)
      assert(z == expect)
    }
    // z-scores of a population sum to ~0
    val zsum = out.map(_._5).sum
    assert(math.abs(zsum) < 0.01)
  }

  test("tfidfTopTerms: hand corpus — corpus-wide terms score 0, rare terms rank first") {
    val df = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(df).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank")) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // N=2; df: apple 1, banana 2, cherry 1
    assert(got((1L, 1)) == (("apple", 2L, 1L, 1.3863)))   // 2·ln2
    assert(got((1L, 2)) == (("banana", 1L, 2L, 0.0)))     // ln1 = 0
    assert(got((2L, 1)) == (("cherry", 1L, 1L, 0.6931)))  // ln2
    assert(got((2L, 2)) == (("banana", 1L, 2L, 0.0)))
  }

  test("frameDedup: shared frames across distinct media collide; unique media absent") {
    val shared = "shared-frame-content"
    val df = Seq(
      (1L, shared), (2L, shared),          // same single frame in two docs
      (3L, "completely different bytes")   // unique frame
    ).toDF("doc_id", "text")
    val out = Multimodal.frameDedup(df).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_frames") == 2L &&
      out(0).getAs[Long]("n_docs") == 2L &&
      out(0).getAs[Long]("keeper_doc") == 1L)
  }

  test("mediaReport: per-modality counts/bytes/dups match a JVM group-by of the feature frame") {
    val feats = Multimodal.pipeline(docs).collect()
      .map(r => (r.getAs[String]("media_type"), r.getAs[Int]("n_bytes"),
        r.getAs[String]("content_md5")))
    def r4(d: Double) = java.math.BigDecimal.valueOf(d)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    val expect = feats.groupBy(_._1).map { case (mt, xs) =>
      val uniq = xs.map(_._3).distinct.length.toLong
      mt -> ((xs.length.toLong, xs.map(_._2.toLong).sum, uniq,
        r4(1.0 - uniq.toDouble / xs.length)))
    }
    val got = Multimodal.mediaReport(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got == expect)
  }

  test("lengthQuantilesApprox: exact-regime rank values vs the exact mode; coarse sketch within the rank bound") {
    import org.apache.spark.sql.functions.{coalesce, col, length, lit, size, split, trim}
    val t = trim(coalesce(col("text"), lit("")))
    val lens = docs.filter(length(t) > 0)
      .select(col("source"), size(split(t, "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).sorted }
    val got = TextAnalysis.lengthQuantilesApprox(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    lens.foreach { case (src, ws) =>
      val n = ws.length
      val (nd, p50, p90, p99) = got(src)
      assert(nd == n)
      // exact regime: the sketch returns the value at 1-based rank ⌈q·n⌉
      assert(p50 == ws(math.ceil(0.5 * n).toInt - 1), s"$src p50")
      assert(p90 == ws(math.ceil(0.9 * n).toInt - 1), s"$src p90")
      assert(p99 == ws(math.ceil(0.99 * n).toInt - 1), s"$src p99")
    }
    // compressed regime: data-value quantiles whose rank INTERVAL
    // (ties occupy [count(<v)+1, count(≤v)]) meets the GK bound
    TextAnalysis.lengthQuantilesApprox(docs, accuracy = 10).collect().foreach { r =>
      val ws = lens(r.getString(0)); val n = ws.length
      Seq((r.getLong(2), 0.5), (r.getLong(3), 0.9), (r.getLong(4), 0.99)).foreach { case (v, q) =>
        assert(ws.contains(v), s"quantile $v must be a data value")
        val lo = ws.count(_ < v) + 1
        val hi = ws.count(_ <= v)
        val err = if (q * n >= lo && q * n <= hi) 0.0
          else math.min(math.abs(lo - q * n), math.abs(hi - q * n))
        assert(err <= n / 10.0 + 1, s"${r.getString(0)} q=$q rank [$lo,$hi] vs ${q * n}")
      }
    }
  }

  test("multimodal: md5 of bytes equals md5 of the source text utf-8") {
    val one = Multimodal.pipeline(docs.limit(1)).collect()(0)
    val txt = docs.limit(1).select("text").collect()(0).getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one.getAs[String]("content_md5") == expected)
  }

  test("zipfReport: exact-Zipf corpus fits slope −1 / r² 1; uniform counts fit slope 0; natural corpus near −1") {
    import spark.implicits._
    // counts exactly C/r for r = 1..6 (all integral for C = 120):
    // y = ln C − ln r is exactly linear in x = ln r → slope −1, r² = 1
    val zipfText = (1 to 6).map(r => (s"w$r " * (120 / r)).trim).mkString(" ")
    val uniText = (1 to 5).map(r => (s"u$r " * 10).trim).mkString(" ")
    val hand = Seq((1L, "z", zipfText), (2L, "u", uniText)).toDF("doc_id", "source", "text")
    val got = TextAnalysis.zipfReport(hand).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4)))).toMap
    assert(got("z")._1 == 6L)
    assert(math.abs(got("z")._2 - (-1.0)) < 1e-9, s"exact-Zipf slope ${got("z")._2}")
    assert(math.abs(got("z")._3 - 1.0) < 1e-9, s"exact-Zipf r2 ${got("z")._3}")
    assert(got("u")._2 == 0.0, "uniform counts → slope 0")
    // the test corpus is SYNTHETIC — r² varies by source (measured
    // 0.22–0.77 at sf0.001, vs ≈0.9+ for natural text): the card
    // separates sources exactly as designed; assert only the
    // invariants (negative slope, r² well-formed, per-source rows)
    val real = TextAnalysis.zipfReport(docs).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(4)))
    assert(real.nonEmpty)
    real.foreach { case (src, slope, r2) =>
      assert(slope < 0.0, s"$src slope $slope must be negative")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$src r2 $r2 out of range")
    }
  }
}
