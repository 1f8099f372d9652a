package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CosineSimilarity, TextKernels}

/** Property-style tests (seeded random inputs) for the pure kernels —
  * these run on the JVM directly, no Spark jobs, so hundreds of cases
  * are cheap. */
class KernelPropertySpec extends SparkSpec {

  private def utf8Array(ss: Seq[String]): GenericArrayData =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s): Any).toArray)

  private def randTokens(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n)(("tok" + rnd.nextInt(50)))

  test("fnv64: deterministic, sensitive to every byte") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(40) + 1)
      val b = s.getBytes("UTF-8")
      assert(TextKernels.fnv64(b) == TextKernels.fnv64(b.clone()))
      if (b.nonEmpty) {
        val mutated = b.clone(); mutated(rnd.nextInt(b.length)) = (mutated(rnd.nextInt(b.length)) + 1).toByte
        if (!java.util.Arrays.equals(mutated, b))
          assert(TextKernels.fnv64(mutated) != TextKernels.fnv64(b))
      }
    }
  }

  test("exact-integer half-away mean (randomized differential): sign·((200·|W|+k) DIV (2k))/10⁶ == BigDecimal HALF_UP of (W·10⁻⁴)/k at scale 6") {
    // the d_dsir_curve mean_weight recipe (CLAUDE.md ROUND-tie
    // conventions): W = Σ round(w·10⁴) over ROUND(,4) values, k the
    // count — the integer formula must equal exact decimal half-away
    // rounding for EVERY (W, k), including the …5 ties and negatives
    val rnd = new Random(23)
    def intForm(bigW: Long, k: Long): BigDecimal = {
      val sign = if (bigW < 0) -1 else 1
      BigDecimal(sign) * BigDecimal((200L * math.abs(bigW) + k) / (2L * k)) / BigDecimal(1000000)
    }
    def decForm(bigW: Long, k: Long): BigDecimal =
      (BigDecimal(bigW) / BigDecimal(10000) / BigDecimal(k))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    (1 to 2000).foreach { _ =>
      val k = rnd.nextInt(1000) + 1L
      val w = rnd.nextLong() % 2000000L // ±2·10⁶ fourth-decimal units
      assert(intForm(w, k) == decForm(w, k), s"W=$w k=$k")
    }
    // planted exact ties both signs: mean·10⁶ = W·100/k lands on …x.5
    // exactly (e.g. W=1, k=8 → 12.5 → must round AWAY to 13)
    Seq((1L, 8L), (-1L, 8L), (3L, 8L), (-3L, 8L), (7L, 40L), (-7L, 40L))
      .foreach { case (w, k) =>
        assert(intForm(w, k) == decForm(w, k), s"tie W=$w k=$k")
      }
  }

  test("shingles3: every shingle is 3 tokens; count ≤ tokens−2; distinct") {
    val rnd = new Random(11)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(30)
      val text = randTokens(rnd, n).mkString(" ")
      val sh = TextKernels.shingles3(UTF8String.fromString(text))
      val out = (0 until sh.numElements()).map(sh.getUTF8String(_).toString)
      assert(out.size == out.distinct.size)
      if (n < 3) assert(out.isEmpty) else assert(out.size <= n - 2)
      out.foreach(s => assert(s.split(" ").length == 3))
    }
  }

  test("minhash128: element-wise min property under union; J≈ agreement rate") {
    val rnd = new Random(13)
    (1 to 50).foreach { _ =>
      val a = randTokens(rnd, rnd.nextInt(30) + 5).distinct.map(_ + " x y")
      val b = randTokens(rnd, rnd.nextInt(30) + 5).distinct.map(_ + " x y")
      val sa = TextKernels.minhash128(utf8Array(a))
      val sb = TextKernels.minhash128(utf8Array(b))
      val su = TextKernels.minhash128(utf8Array((a ++ b).distinct))
      (0 until 128).foreach { p =>
        assert(su.getLong(p) == math.min(sa.getLong(p), sb.getLong(p)))
      }
      // agreement rate estimates jaccard (loose statistical bound, 128 perms)
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val j = inter / (a.toSet ++ b.toSet).size
      val agree = (0 until 128).count(p => sa.getLong(p) == sb.getLong(p)) / 128.0
      assert(math.abs(agree - j) < 0.25, s"J=$j agree=$agree")
    }
  }

  test("simhash64: invariant to token order and to duplicating the multiset") {
    val rnd = new Random(17)
    (1 to 100).foreach { _ =>
      val toks = randTokens(rnd, rnd.nextInt(40) + 1)
      val fp = TextKernels.simhash64(utf8Array(toks))
      assert(TextKernels.simhash64(utf8Array(rnd.shuffle(toks))) == fp)
      assert(TextKernels.simhash64(utf8Array(toks ++ toks)) == fp)
    }
  }

  test("cosine kernel: symmetry, bounds, scale behavior") {
    val rnd = new Random(19)
    def arr(v: Seq[Float]) = new GenericArrayData(v.map(x => x: Any).toArray)
    val cs = CosineSimilarity(null, null)
    (1 to 100).foreach { _ =>
      val n = rnd.nextInt(32) + 1
      val a = Seq.fill(n)(rnd.nextFloat() * 2 - 1)
      val b = Seq.fill(n)(rnd.nextFloat() * 2 - 1)
      val ab = cs.nullSafeEval(arr(a), arr(b)).asInstanceOf[Double]
      val ba = cs.nullSafeEval(arr(b), arr(a)).asInstanceOf[Double]
      assert(ab == ba)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      // positive scaling leaves cosine unchanged (up to fp noise)
      val a2 = a.map(_ * 2.0f)
      val ab2 = cs.nullSafeEval(arr(a2), arr(b)).asInstanceOf[Double]
      assert(math.abs(ab2 - ab) < 1e-6)
    }
  }

  test("stopwordProfile (randomized differential): matches a brute-force count") {
    val rnd = new Random(17)
    (1 to 200).foreach { _ =>
      val toks = randTokens(rnd, rnd.nextInt(40))
      val text = toks.mkString("  ") // runs of whitespace collapse in tokenize
      val lists = Seq.fill(rnd.nextInt(4))(randTokens(rnd, rnd.nextInt(8)).distinct)
      val listsData = new GenericArrayData(lists.map(l => utf8Array(l): Any).toArray)
      val out = TextKernels.stopwordProfile(UTF8String.fromString(text), listsData)
      assert(out.getInt(0) == toks.length)
      lists.zipWithIndex.foreach { case (l, i) =>
        assert(out.getInt(i + 1) == toks.count(l.toSet), s"list $i of $lists on $toks")
      }
    }
  }

  test("repetitionProfile invariants: total = n−2, distinct ≤ total, maxFreq consistent") {
    val rnd = new Random(19)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(40)
      val toks = randTokens(rnd, n)
      val out = TextKernels.repetitionProfile(UTF8String.fromString(toks.mkString(" ")))
      val (total, distinct, maxF) = (out.getInt(0), out.getInt(1), out.getInt(2))
      if (n < 3) assert(total == 0 && distinct == 0 && maxF == 0)
      else {
        val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
        assert(total == n - 2 && total == grams.size)
        assert(distinct == grams.distinct.size)
        assert(maxF == grams.groupBy(identity).values.map(_.size).max)
        assert(distinct <= total && maxF >= 1 && maxF <= total)
        // distinct * maxF >= total (pigeonhole on the most common gram)
        assert(distinct.toLong * maxF >= total)
      }
    }
  }

  test("nearestCentroids: sorted by distance, agrees with an exhaustive scan") {
    val rnd = new Random(23)
    (1 to 100).foreach { _ =>
      val dim = rnd.nextInt(8) + 1
      val k = rnd.nextInt(6) + 1
      val m = rnd.nextInt(k) + 1
      val emb = Array.fill(dim)(rnd.nextFloat())
      val cents = Seq.fill(k)(Seq.fill(dim)(rnd.nextDouble()))
      val embData = new GenericArrayData(emb.map(Float.box: Float => Any))
      val centData = new GenericArrayData(
        cents.map(c => new GenericArrayData(c.map(Double.box: Double => Any).toArray): Any).toArray)
      val got = TextKernels.nearestCentroids(embData, centData, m)
      val out = (0 until got.numElements()).map(got.getInt)
      def d2(c: Seq[Double]) =
        c.indices.map { j => val d = emb(j).toDouble - c(j); d * d }.sum
      val expect = cents.indices.sortBy(i => (d2(cents(i)), i)).take(m)
      assert(out == expect, s"dim=$dim k=$k m=$m")
    }
  }

  test("asof (randomized differential): matches an O(n²) reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(23)
    (1 to 3).foreach { round =>
      val leftRows = Seq.fill(120)((rnd.nextInt(6).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000) * 1000L), rnd.nextLong().abs))
      val rightRows = Seq.fill(150)((rnd.nextInt(6).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000) * 1000L), rnd.nextLong().abs))
      val left = leftRows.toDF("k", "lts", "lid")
      val right = rightRows.toDF("k", "rts", "rid")
      val got = graft.ops.Temporal.asof(left, right, "k", "lts", "rts", Seq("rts", "rid"), "rid")
        .collect().map(r => (r.getAs[Long]("lid"),
          Option(r.getAs[java.sql.Timestamp]("asof_rts")), Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)))
        .toSet
      val expected = leftRows.map { case (k, lts, lid) =>
        val cands = rightRows.filter(r => r._1 == k && !r._2.after(lts))
        if (cands.isEmpty) (lid, None, None)
        else {
          val best = cands.maxBy(r => (r._2.getTime, r._3))
          (lid, Some(best._2): Option[java.sql.Timestamp], Some(best._3): Option[Long])
        }
      }.toSet
      assert(got == expected, s"round $round differs")
    }
  }

  test("misraGries: seeded random streams — threshold completeness, size bound, subset of support") {
    val rnd = new Random(31)
    (1 to 100).foreach { round =>
      val m = rnd.nextInt(40) + 8
      // zipf-ish stream: small ids exponentially more frequent
      val stream = Seq.fill(rnd.nextInt(3000) + 200)(
        s"item${(math.pow(rnd.nextDouble(), 3) * 500).toInt}")
      val out = graft.ops.TextAnalysis.misraGries(stream.iterator, m).toSet
      assert(out.size <= m, s"round $round: summary exceeded m")
      assert(out.subsetOf(stream.toSet), s"round $round: phantom candidate")
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val threshold = stream.size.toDouble / m
      counts.foreach { case (item, c) =>
        if (c > threshold)
          assert(out.contains(item), s"round $round: lost heavy item $item ($c > $threshold)")
      }
    }
  }

  test("normalizeText: idempotent; NFC-equivalent spellings collide; never grows") {
    val rnd = new Random(17)
    def norm(s: String): String =
      TextKernels.normalizeText(UTF8String.fromString(s)).toString
    (1 to 200).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(60))
      val once = norm(s)
      assert(norm(once) == once, s"not idempotent on ${s.toSeq.map(_.toInt)}")
      // (no length law: NFC may legitimately EXPAND -- e.g. U+0344's
      // canonical decomposition has no recomposition)
      assert(!once.exists(c => c < ' '), "no control chars survive")
      assert(!once.contains("  "), "no double spaces survive")
    }
    // canonical equivalence: composed and decomposed spellings normalize alike
    assert(norm("He\u0301llo") == norm("H\u00e9llo"))
  }

  test("charSyms + bpeMerge: syms concatenate back to the word; merge conserves content, never grows") {
    val rnd = new Random(19)
    (1 to 200).foreach { _ =>
      val w = Seq.fill(rnd.nextInt(12) + 1)(('a' + rnd.nextInt(3)).toChar).mkString
      val syms = TextKernels.charSyms(UTF8String.fromString(w))
      val symSeq = (0 until syms.numElements()).map(syms.getUTF8String(_).toString)
      assert(symSeq.mkString == w, "round-0 segmentation must cover the word")
      val a = ('a' + rnd.nextInt(3)).toChar.toString
      val b = ('a' + rnd.nextInt(3)).toChar.toString
      val merged = TextKernels.bpeMerge(syms,
        UTF8String.fromString(a), UTF8String.fromString(b))
      val mergedSeq = (0 until merged.numElements()).map(merged.getUTF8String(_).toString)
      assert(mergedSeq.mkString == w, "merging must conserve the text")
      assert(mergedSeq.length <= symSeq.length)
      // the no-survivor law: an adjacent (a, b) of ORIGINAL single
      // symbols cannot survive the merge pass (if both appear unmerged
      // in the output, the greedy scan would have consumed them)
      if (mergedSeq.length >= 2)
        mergedSeq.sliding(2).foreach {
          case Seq(x, y) => assert(!(x == a && y == b),
            s"unmerged adjacent ($a,$b) survived in $mergedSeq of word $w")
          case _ =>
        }
    }
    // hand case: greedy leftmost on "abcabab" merging (a,b)
    val syms = TextKernels.charSyms(UTF8String.fromString("abcabab"))
    val m = TextKernels.bpeMerge(syms, UTF8String.fromString("a"), UTF8String.fromString("b"))
    val out = (0 until m.numElements()).map(m.getUTF8String(_).toString)
    assert(out == Seq("ab", "c", "ab", "ab"))
  }

  test("spanDedup: identity on duplicate-free corpora; idempotent on any corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(37)
    // duplicate-free: every doc gets globally unique tokens → no span repeats
    val unique = (0 until 40).map { d =>
      (d.toLong, "s", (0 until rnd.nextInt(60) + 1).map(t => s"u${d}x$t").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = graft.ops.Dedup.spanDedup(unique, k = 7).collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getAs[Int]("n_dropped") == 0)
    }
    // idempotence: running span dedup on its own cleaned output changes nothing
    val docs = graft.core.Tables(spark, TestSpark.sf0001).documents
    val once = graft.ops.Dedup.spanDedup(docs, k = 20)
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
    val twice = graft.ops.Dedup.spanDedup(once, k = 20)
    assert(twice.filter(col("n_dropped") =!= 0).count() == 0,
      "a cleaned corpus must contain no duplicated spans")
  }
}
