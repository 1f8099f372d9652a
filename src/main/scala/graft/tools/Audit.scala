package graft.tools
import graft.core.{GraftSession, Tables}
import graft.queries.AnalyticsQueries
import graft.ops.Dedup
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "audit").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val shuffles = p.linesIterator.count(_.contains("Exchange"))
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
      val shj = p.linesIterator.count(_.contains("ShuffledHashJoin"))
      println(s"[audit] $name: exchanges=$shuffles bhj=$bhj smj=$smj shj=$shj")
      if (args.contains(name)) println(p)
    }
    audit("q3", AnalyticsQueries.shippingPriority(t))
    audit("q5", AnalyticsQueries.localSupplier(t))
    audit("asof", AnalyticsQueries.asofJoin(t))
    audit("sessionize", AnalyticsQueries.sessionize(t))
    audit("minhash", Dedup.minhashCandidates(t.documents))
    audit("ngram", Dedup.ngramJaccardPairs(t.documents))
    audit("semi", AnalyticsQueries.semiJoin(t))
    spark.stop()
  }
}
