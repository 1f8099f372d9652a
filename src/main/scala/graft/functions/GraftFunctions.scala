package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Cosine similarity between two `Array[Float]` embedding columns, as a
  * native Catalyst expression with whole-stage codegen (`doGenCode`).
  *
  * Chosen over a Scala UDF (ser/de per row, opaque to the optimizer) and
  * over `aggregate`/`zip_with` higher-order functions (CodegenFallback —
  * they break the WholeStageCodegen span and allocate intermediate
  * arrays). This expression reads the two float arrays in place and folds
  * dot/norms in doubles, in index order — so the result is bit-identical
  * to any engine that folds sequentially in doubles (the DuckDB oracles
  * replicate exactly this: `dot / (sqrt(na) * sqrt(nb))`, 0.0 when a norm
  * is zero).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two array<float> columns, got ${l.sql} and ${r.sql}")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $a.getFloat($i);
         |  final double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |""".stripMargin
    })
}

/** Hamming distance between two 64-bit fingerprints (e.g. SimHash).
  * Compiles to a single `Long.bitCount(a ^ b)` inside codegen. */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming64"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_hamming64 expects two bigint columns, got ${l.sql} and ${r.sql}")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDistance64 =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
}

/** Registration (via `SparkSessionExtensions`, wired in `GraftSession`)
  * plus Column-API wrappers. Any session built through
  * `GraftSession.builder` has `graft_cosine` / `graft_hamming64`
  * available both in SQL and through these wrappers. */
object GraftFunctions {

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hamming64"),
      new ExpressionInfo(classOf[HammingDistance64].getName, "graft_hamming64"),
      (children: Seq[Expression]) => HammingDistance64(children(0), children(1))))
  }

  /** Cosine similarity of two Array[Float] columns → double. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Hamming distance of two int64 fingerprint columns → int. */
  def hamming64(a: Column, b: Column): Column = call_function("graft_hamming64", a, b)
}
