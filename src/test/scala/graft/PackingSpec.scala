package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Packing

/** Sequence-packing semantics: chunk assignment, conservation, and
  * shard-parallel determinism. */
class PackingSpec extends SparkSpec {

  test("packCurve: hand-computed bins/util per ctx; planted oversize; 13/32 tie rounds half-away") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "d e f", "A"), (3L, "g h", "A"), // 3, 3, 2 tokens
      (4L, "p q r s t", "B")                                    // 5 tokens
    ).toDF("doc_id", "text", "source")
    val got = Packing.packCurve(docs, ctxs = Seq(4, 8, 16)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // ctx 4: A packs NFD [3][3][2] (three bins), B [5] is an oversize
    // singleton → 4 bins, util = 13/16 = 0.8125 (exact at 4 decimals)
    assert(got(4) == ((4L, 4L, 13L, 1L, 0.8125)), s"ctx4: ${got(4)}")
    // ctx 8: A [3,3,2] fills a bin EXACTLY (8 = ctx is not oversize),
    // B [5] → 2 bins, util 13/16 again
    assert(got(8) == ((2L, 4L, 13L, 0L, 0.8125)), s"ctx8: ${got(8)}")
    // ctx 16: util = 13/32 = 0.40625 — the …5 tie must round half-AWAY
    assert(got(16) == ((2L, 4L, 13L, 0L, 0.4063)), s"ctx16: ${got(16)}")
  }

  test("seqBins: capacity respected, tokens conserved, < 2× optimal, partition-invariant") {
    import graft.ops.Packing
    import graft.core.Tables
    import spark.implicits._
    val docs = Tables(spark, TestSpark.sf0001).documents
    val ctx = 512
    val rows = Packing.seqBins(docs, ctx).collect()
    // capacity: only flagged oversize bins exceed ctx, and they are singletons
    rows.foreach { r =>
      if (r.getAs[Boolean]("oversize")) assert(r.getAs[Long]("n_docs") == 1L)
      else assert(r.getAs[Long]("bin_tokens") <= ctx)
    }
    // token conservation against a direct count
    val total = docs.select(
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.regexp_count(
        $"text", org.apache.spark.sql.functions.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))))
      .collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("bin_tokens")).sum == total)
    // next-fit bound per shard: bins < 2×⌈tokens/ctx⌉ + oversize count
    rows.groupBy(_.getAs[String]("shard")).foreach { case (s, bs) =>
      val tok = bs.map(_.getAs[Long]("bin_tokens")).sum
      val oversize = bs.count(_.getAs[Boolean]("oversize"))
      assert(bs.length <= 2 * math.ceil(tok.toDouble / ctx).toLong + oversize,
        s"shard $s: ${bs.length} bins for $tok tokens")
    }
    // deterministic under any input partitioning
    val again = Packing.seqBins(docs.repartition(17), ctx).collect()
      .map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
  }

  test("seqBinsBfd hand example: best-fit reopens earlier bins that next-fit closed") {
    import spark.implicits._
    // ctx=512, tokens desc 300,280,220,200: NFD = [300][280+220][200] = 3 bins;
    // BFD packs 200 back into the first bin (tightest fit) = 2 bins
    val d = Seq((1L, "s", ("a " * 300).trim), (2L, "s", ("a " * 280).trim),
      (3L, "s", ("a " * 220).trim), (4L, "s", ("a " * 200).trim))
      .toDF("doc_id", "source", "text")
    val nfd = Packing.seqBins(d, 512).collect()
    val bfd = Packing.seqBinsBfd(d, 512).collect()
    assert(nfd.length == 3)
    assert(bfd.length == 2)
    assert(bfd.map(_.getAs[Long]("bin_tokens")).sorted.toSeq == Seq(500L, 500L))
  }

  test("seqBinsBfd: capacity, conservation, ≤ NFD bins, differential vs reference, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val ctx = 512
      // token profile exercises oversize (> ctx), exact-ctx, zero, and a long tail
      val rows = (1 to 150 + trial * 50).map { i =>
        val n = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(2 * ctx)          // anything incl. oversize
          case 1 => ctx                            // exact fill
          case 2 => 0                              // empty doc
          case _ => rnd.nextInt(ctx / 2)           // tail
        }
        (i.toLong, "s" + rnd.nextInt(3), ("a " * n).trim)
      }
      val df = rows.toDF("doc_id", "source", "text")
      val bfd = Packing.seqBinsBfd(df, ctx).collect()
      // capacity: only flagged oversize bins exceed ctx, and they are singletons
      bfd.foreach { r =>
        if (r.getAs[Boolean]("oversize")) assert(r.getAs[Long]("n_docs") == 1L)
        else assert(r.getAs[Long]("bin_tokens") <= ctx)
      }
      // conservation
      val totalTokens = rows.map(_._3.split(" ").count(_.nonEmpty).toLong).sum
      assert(bfd.map(_.getAs[Long]("bin_tokens")).sum == totalTokens)
      assert(bfd.map(_.getAs[Long]("n_docs")).sum == rows.length.toLong)
      // fill never worse than next-fit-decreasing, per shard
      val nfd = Packing.seqBins(df, ctx).collect()
      val binsBy = (rs: Array[org.apache.spark.sql.Row]) =>
        rs.groupBy(_.getAs[String]("shard")).view.mapValues(_.length).toMap
      val (b, n) = (binsBy(bfd), binsBy(nfd))
      b.keySet.foreach(s => assert(b(s) <= n(s), s"trial $trial shard $s: BFD ${b(s)} > NFD ${n(s)}"))
      // differential: independent O(n·bins) reference best-fit (linear scan, lowest-id tie-break)
      val expected = rows.map { case (id, s, t) => (s, id, t.split(" ").count(_.nonEmpty).toLong) }
        .groupBy(_._1).toSeq.flatMap { case (s, ds) =>
          val sorted = ds.sortBy { case (_, id, n2) => (-n2, id) }
          val used = scala.collection.mutable.ArrayBuffer.empty[Long]
          val docs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val open = scala.collection.mutable.ArrayBuffer.empty[Int]
          sorted.foreach { case (_, _, n2) =>
            if (n2 > ctx) { used += n2; docs += 1L }
            else {
              val fits = open.filter(i => ctx - used(i) >= n2)
              if (fits.isEmpty) { used += n2; docs += 1L; open += used.length - 1 }
              else {
                val best = fits.minBy(i => (ctx - used(i), i))
                used(best) += n2; docs(best) += 1
              }
            }
          }
          used.indices.map(i => (s, i.toLong, docs(i), used(i)))
        }.toSet
      val got = bfd.map(r => (r.getAs[String]("shard"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"))).toSet
      assert(got == expected, s"trial $trial: BFD differs from reference best-fit")
      // deterministic under any input partitioning
      val again = Packing.seqBinsBfd(df.repartition(13), ctx).collect().map(_.toString).sorted.toSeq
      assert(again == bfd.map(_.toString).sorted.toSeq)
    }
  }

  import spark.implicits._

  private lazy val docs = Tables(spark, TestSpark.sf0001).documents

  test("hand example: a doc belongs to the chunk its first token lands in") {
    // tokens: 300, 300, 300 with ctx=512 → offsets 0, 300, 600 → chunks 0, 0, 1
    val d = Seq(
      (1L, "s", ("a " * 300).trim),
      (2L, "s", ("b " * 300).trim),
      (3L, "s", ("c " * 300).trim)).toDF("doc_id", "source", "text")
    val out = Packing.seqPack(d, ctx = 512).orderBy("chunk_id")
      .collect().map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    assert(out.toSeq == Seq((0L, 2L, 1L, 2L), (1L, 1L, 3L, 3L)))
  }

  test("conservation: every doc in exactly one chunk, token totals preserved") {
    val out = Packing.seqPack(docs)
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == docs.count())
    val totalTokens = docs
      .select(regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(out.agg(sum("chunk_tokens")).collect()(0).getLong(0) == totalTokens)
  }

  test("chunk ids are contiguous per source and doc ranges do not overlap") {
    val rows = Packing.seqPack(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    rows.groupBy(_._1).foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, "contiguous ids")
      sorted.sliding(2).foreach {
        case Array((_, _, _, lastA), (_, _, firstB, _)) => assert(lastA < firstB)
        case _ =>
      }
    }
  }

  test("packing is partition-invariant and custom shards refine chunks") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(Packing.seqPack(docs.repartition(7))) == rows(Packing.seqPack(docs)))
    // sharding by (source, doc_id range) yields the same token totals
    val sharded = Packing.seqPack(docs, shards = Seq(col("source"), (col("doc_id") / 100).cast("int").as("rng")))
    assert(sharded.agg(sum("chunk_tokens")).collect()(0).getLong(0) ==
      Packing.seqPack(docs).agg(sum("chunk_tokens")).collect()(0).getLong(0))
  }

  test("chunkPlan: hand-grid exact; full coverage; only the last chunk short; scan-side (no Exchange)") {
    // hand corpus: 700 'a' tokens → chunks at 0/128/256/384/512 with the
    // last covering [512, 700); 100 tokens → one chunk; empty → one empty chunk
    val d = Seq(
      (1L, "s", ("a " * 700).trim),
      (2L, "s", ("b " * 100).trim),
      (3L, "s", "")).toDF("doc_id", "source", "text")
    // NULL text = the empty doc: one empty chunk, never a silent drop
    // (the documented coverage guarantee — ADVICE r9)
    val nullDoc = Seq((9L, "s")).toDF("doc_id", "source")
      .withColumn("text", lit(null).cast("string"))
    val nullOut = Packing.chunkPlan(nullDoc).collect()
    assert(nullOut.length == 1 &&
      nullOut(0).getAs[Long]("chunk_tokens") == 0L &&
      nullOut(0).getAs[Long]("chunk_id") == 0L)
    val out = Packing.chunkPlan(d).orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_tokens")))
    val expect1 = Seq((0L, 0L, 256L), (1L, 128L, 256L), (2L, 256L, 256L),
      (3L, 384L, 256L), (4L, 512L, 188L)).map { case (c, s, n) => (1L, c, s, n) }
    assert(out.filter(_._1 == 1L).toSeq == expect1)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 100L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 0L, 0L)))

    // corpus-wide invariants at test SF
    val full = Packing.chunkPlan(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_tokens")))
    assert(full.map(_._1).distinct.length == docs.count(), "every doc yields >= 1 chunk")
    full.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, "contiguous chunk ids")
      sorted.init.foreach { case (_, _, _, n) => assert(n == 256L, "only the last chunk may be short") }
      // coverage: last chunk reaches the end of the doc
      val (_, _, st, n) = sorted.last
      val totalTok = st + n
      assert(sorted.head._3 == 0L && n >= 0L)
      // stride grid + window cap: end of every non-last chunk is start+256 <= total
      sorted.init.foreach { case (_, c, s, _) => assert(s == c * 128 && s + 256 <= totalTok) }
    }
    // scan-side plan: generate + explode only, no shuffle
    val plan = Packing.chunkPlan(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk plan must not shuffle:\n$plan")
  }
}
