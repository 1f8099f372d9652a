package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Config-injectable extensions entry point.
  *
  * `GraftSession.builder` wires the graft functions for Scala callers;
  * this class is the same registration exposed through Spark's
  * `spark.sql.extensions` mechanism, so NON-Scala frontends get the
  * full `graft_*` SQL function surface with zero Scala code:
  *
  * {{{
  * pyspark --jars graft.jar --conf spark.sql.extensions=graft.GraftExtensions
  * spark-sql --jars graft.jar --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Spark instantiates the class reflectively per session build (it must
  * keep a public zero-arg constructor) and applies it to the session's
  * extensions, exactly like `withExtensions`. Registration is
  * per-session state, so different sessions on one SparkContext can opt
  * in independently. See README "Using from PySpark / SQL".
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.register(extensions)
}
