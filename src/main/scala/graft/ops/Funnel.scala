package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Catalog, Tables}

/** The corpus-preparation funnel (SURVEY.md §2.3): the individual
  * cleaning operators composed into the pipeline a training corpus
  * actually runs, reporting per-stage retention —
  *
  *   total → exact dedup → near-dup cluster dedup → quality filter →
  *   decontamination
  *
  * Stages nest by construction: a near-dup cluster representative is
  * the minimum doc_id of its component, and every smaller member of its
  * exact-hash group is in the same component, so cluster survivors ⊆
  * exact survivors. Each stage passes only doc_ids (left-semi/anti
  * joins) — the text column never crosses a stage boundary, so at
  * corpus scale the funnel moves key columns, not payloads.
  *
  * Output is one row per stage (stage_order, stage, n_docs): the
  * monitoring table every production ingest job emits.
  */
object Funnel {

  def funnel(documents: DataFrame, clusterAssignment: DataFrame): DataFrame = {
    val total = documents.select(col("doc_id"))
    val exact = Dedup.dedupDocuments(documents).select(col("doc_id"))
    val reps = clusterAssignment
      .where(col("doc_id") === col("cluster_id")).select(col("doc_id"))
    // quality bucket != 'low' reduces to n_tokens >= 20 (see TextAnalysis)
    val quality = TextAnalysis.quality(documents)
      .where(col("quality_bucket") =!= "low").select(col("doc_id"))
    val afterQuality = reps.join(quality, Seq("doc_id"), "left_semi")
    val contaminated = TextAnalysis.decontaminate(documents).select(col("doc_id"))
    val afterDecon = afterQuality.join(contaminated, Seq("doc_id"), "left_anti")

    def stage(i: Int, name: String, ids: DataFrame): DataFrame =
      ids.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage_order"), lit(name).as("stage"), col("n_docs"))

    stage(0, "total", total)
      .unionByName(stage(1, "exact_dedup", exact))
      .unionByName(stage(2, "neardup_cluster", reps))
      .unionByName(stage(3, "quality", afterQuality))
      .unionByName(stage(4, "decontaminate", afterDecon))
  }

  // ---- driver wiring ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_pipeline_funnel" -> ((s, d) =>
      funnel(Tables(s, d).documents, Catalog.dupClusters(s, d))))

  /** DuckDB mirror: every stage reuses the other keys' oracle logic
    * (exact-hash min, recursive-closure components, n_tokens quality,
    * broadcast n-gram contamination), composed in one CTE chain. */
  private val funnelOracle = {
    val shingles = Dedup.shingleCte.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$shingles,
       |${Dedup.invPairCte},
       |near AS (SELECT doc_a, doc_b FROM p
       |         WHERE ROUND(CAST(inter AS DOUBLE) / (la + lb - inter), 4) >= 0.8),
       |hx AS (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
       |       FROM documents),
       |hub AS (SELECT h, MIN(doc_id) AS hub FROM hx GROUP BY h HAVING COUNT(*) > 1),
       |exact_e AS (SELECT hub.hub AS doc_a, hx.doc_id AS doc_b
       |            FROM hx JOIN hub USING (h) WHERE hx.doc_id != hub.hub),
       |e0 AS (SELECT doc_a AS u, doc_b AS v FROM near
       |       UNION SELECT doc_a, doc_b FROM exact_e),
       |e AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.id),
       |assign AS (SELECT id, MIN(r) AS root FROM reach GROUP BY id),
       |keepx AS (SELECT doc_id FROM documents WHERE doc_id IN (
       |  SELECT MIN(doc_id) FROM documents
       |  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))),
       |reps AS (SELECT id AS doc_id FROM assign WHERE id = root),
       |ntok AS (SELECT doc_id,
       |    len(list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
       |        t -> t != '')) AS n_tokens
       |  FROM documents),
       |after_q AS (SELECT r.doc_id FROM reps r JOIN ntok USING (doc_id)
       |            WHERE ntok.n_tokens >= 20),
       |ev AS (SELECT DISTINCT g FROM (
       |    SELECT unnest(d.sh) AS g
       |    FROM d JOIN documents doc ON d.doc_id = doc.doc_id
       |    WHERE doc.source = 'src19')),
       |corpus AS (SELECT d.doc_id, unnest(d.sh) AS g
       |  FROM d JOIN documents doc ON d.doc_id = doc.doc_id
       |  WHERE doc.source != 'src19'),
       |contam AS (SELECT c.doc_id FROM corpus c JOIN ev ON c.g = ev.g
       |           GROUP BY c.doc_id HAVING COUNT(*) >= 2),
       |after_d AS (SELECT doc_id FROM after_q
       |            WHERE doc_id NOT IN (SELECT doc_id FROM contam))
       |SELECT 0 AS stage_order, 'total' AS stage, COUNT(*) AS n_docs FROM documents
       |UNION ALL SELECT 1, 'exact_dedup', COUNT(*) FROM keepx
       |UNION ALL SELECT 2, 'neardup_cluster', COUNT(*) FROM reps
       |UNION ALL SELECT 3, 'quality', COUNT(*) FROM after_q
       |UNION ALL SELECT 4, 'decontaminate', COUNT(*) FROM after_d""".stripMargin
  }

  val oracles: Map[String, String] = Map("d_pipeline_funnel" -> funnelOracle)
}
