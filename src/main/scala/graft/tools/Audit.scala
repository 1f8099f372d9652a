package graft.tools

import graft.core.GraftSession

/** Plan-shape audit over EVERY SparkEntry key: exchanges (shuffles),
  * join strategies, and codegen fallbacks per executed plan. Run with a
  * key name as an argument to print that plan in full.
  *
  *   sbt "runMain graft.tools.Audit"            # summary table
  *   sbt "runMain graft.tools.Audit q5_local_supplier"
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", "graft-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"${"key"}%-22s ex  bhj smj shj  notes")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count()
        val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        def c(s: String) = p.linesIterator.count(_.contains(s))
        val notes = Seq(
          if (c("SortMergeJoin") > 0) Some("sort-merge join") else None,
          if (c("CartesianProduct") > 0) Some("CARTESIAN") else None,
          if (c("BroadcastNestedLoopJoin") > 0) Some("bnlj") else None
        ).flatten.mkString(", ")
        println(f"$name%-22s ${c("Exchange")}%-3d ${c("BroadcastHashJoin")}%-3d ${c("SortMergeJoin")}%-3d ${c("ShuffledHashJoin")}%-3d  $notes")
        if (args.contains(name)) println(p)
      } catch {
        case e: Throwable => println(f"$name%-22s FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
