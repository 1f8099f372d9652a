package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated key subset for fast local checks
    // (the driver always runs the full 2-arg form)
    val keep: String => Boolean =
      if (args.length > 2) args(2).split(",").toSet else (_: String) => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", "graft-verify")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Tolerance specs for the sketch-valued keys (no hash oracle exists
    // by construction): the checker runs exact_sql in DuckDB and bounds
    // the sketch columns within tol of exact — machine-checked, not
    // rows-only.
    val specJson = SparkEntry.specBounds.filter(kv => keep(kv._1))
      .map { case (k, b) =>
        val ac = b.approxCols.map(q).mkString("[", ",", "]")
        val kc = b.keyCols.map(q).mkString("[", ",", "]")
        s"${q(k)}: {${q("exact_sql")}: ${q(b.exactSql)}, ${q("tol")}: ${b.tol}, " +
          s"${q("approx_cols")}: $ac, ${q("key_cols")}: $kc, " +
          s"${q("exact_key")}: ${q(b.exactKey)}}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/spec_bounds.json"), specJson)
    // POSITIVE in-engine bound check for the sketch keys (VERDICT r10
    // #6): the exact twin is itself a SparkEntry key, so the 2% bound
    // is evaluated right here — sketch result ⋈ exact result on the
    // key cols, every approx col within tol — and the verdict ships
    // with the dump as spec_bounds_result.json. A violation is printed
    // loudly AND recorded pass=false, so the round artifact carries a
    // machine-checked verdict for these keys even when the downstream
    // checker does not consume the spec protocol.
    locally {
      import org.apache.spark.sql.functions.{abs, col, greatest, lit, max, when}
      // The dump loop just wrote every key's rows to outDir — read those
      // back rather than re-planning the (expensive) profiler scans, so
      // the bound check is nearly free AND runs on the exact rows the
      // downstream checker sees. Recompute only if a key's dump is
      // missing (subset runs / a dump failure).
      def resultOf(key: String) = {
        val p = Paths.get(s"$outDir/$key")
        if (Files.exists(p)) spark.read.parquet(p.toString)
        else SparkEntry.queries(key)(spark, sfDir)
      }
      val results = SparkEntry.specBounds.filter(kv => keep(kv._1)).map { case (k, b) =>
        try {
          val approxDf = resultOf(k)
          val exactDf0 = resultOf(b.exactKey)
          val exactDf = b.approxCols.foldLeft(exactDf0) { (df, c) =>
            df.withColumnRenamed(c, s"${c}__exact")
          }.select((b.keyCols ++ b.approxCols.map(_ + "__exact")).map(col): _*)
          val (na, ne) = (approxDf.count(), exactDf.count())
          val joined = approxDf.join(exactDf, b.keyCols)
          val nj = joined.count()
          // NULL-safe: max() would silently SKIP a null diff, letting a
          // missing sketch value pass — both-null matches (0), a
          // one-sided null is an automatic violation (finite sentinel
          // > any tol, kept out of the JSON-hostile Infinity range).
          val errCols = b.approxCols.map { c =>
            val a = col(c).cast("double"); val e = col(s"${c}__exact").cast("double")
            max(when(a.isNull && e.isNull, lit(0.0))
              .when(a.isNull || e.isNull, lit(9.9e99))
              .otherwise(abs(a - e) / greatest(e, lit(1.0)))).as(c)
          }
          val errs = joined.agg(errCols.head, errCols.tail: _*).collect()(0)
          // empty join → null aggregates; only a legitimately-empty pair
          // of results (na == ne == 0) reads as zero error
          val maxErr = b.approxCols.indices
            .map(i => if (errs.isNullAt(i)) { if (na == 0 && ne == 0) 0.0 else 9.9e99 }
                      else errs.getDouble(i)).max
          val pass = na == ne && nj == na && maxErr <= b.tol
          if (!pass) System.err.println(
            s"[verify] SPEC BOUND VIOLATION $k: rows a=$na e=$ne joined=$nj max_rel_err=$maxErr tol=${b.tol}")
          else println(f"[verify] spec bound $k: PASS (max_rel_err=$maxErr%.4f tol=${b.tol})")
          s"${q(k)}: {${q("pass")}: $pass, ${q("max_rel_err")}: $maxErr, " +
            s"${q("tol")}: ${b.tol}, ${q("rows")}: $na, ${q("rows_exact")}: $ne, " +
            s"${q("rows_joined")}: $nj, ${q("exact_key")}: ${q(b.exactKey)}}"
        } catch { case e: Throwable =>
          System.err.println(s"[verify] spec bound $k failed to evaluate: ${e.getMessage}")
          s"${q(k)}: {${q("pass")}: false, ${q("err")}: ${q(String.valueOf(e.getMessage))}}"
        }
      }
      Files.writeString(Paths.get(s"$outDir/spec_bounds_result.json"),
        results.mkString("{", ",", "}"))
    }
    spark.stop()
  }
}
