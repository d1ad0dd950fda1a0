package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Σ aᵢ·bᵢ for two double arrays — the cosine verifiers' inner kernel.
  *
  * The pair-verify paths (`LlmOps.similarityPairs`,
  * `similarityPairsLsh`, `dedupCosineIncremental`) evaluate a dot
  * product on every candidate pair. The r2–r5 implementation was a
  * Scala UDF (`dotKernel`): JIT'd loops, but each call crosses the UDF
  * boundary — both arrays convert ArrayData → boxed `Seq[Double]` per
  * pair, and the surrounding codegen span splits at the UDF. This
  * expression keeps the same O(dim) primitive loop INSIDE whole-stage
  * codegen reading `ArrayData.getDouble` directly: no per-pair
  * boxing/copy, no span break. (The higher-order-function formulation
  * `aggregate(zip_with(...))` is worse than both — Catalyst evaluates
  * HOFs interpreted, with a lambda dispatch per element.)
  *
  * Length mismatch follows the UDF's contract: iterate min(n, m).
  * Null array in → null out (BinaryExpression null-safe contract);
  * null ELEMENTS are not produced by the embedding pipelines and read
  * as undefined content, never a crash.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  private val fnName = "graft_dot_product_d"

  /** Column API over the expression (same temp-function bridge as
    * [[SortedIntersectCount]]). */
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => DotProductD(exprs(0), exprs(1)),
      "built-in")
    call_function(fnName, a, b)
  }
}
