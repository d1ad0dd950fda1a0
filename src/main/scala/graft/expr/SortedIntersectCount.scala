package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `|A ∩ B|` for two SORTED long arrays, as a single merge scan.
  *
  * The near-dup verifiers (`LlmOps.nearDupPairsMinhash`,
  * `jaccardPairs`) compute exact Jaccard on millions of candidate
  * pairs; built-in `array_intersect` builds a hash set AND
  * materializes the intersection array per pair, when only the SIZE is
  * needed. On pre-sorted inputs this merge scan is allocation-free and
  * branch-cheap: O(n+m) long compares inside whole-stage codegen
  * (`doGenCode` below — the expression stays inside the codegen span,
  * no UDF boundary). Callers sort each document's token-hash array
  * ONCE (per doc, not per pair) with `sort_array`.
  *
  * Inputs must be ascending. Duplicate-free inputs give |A ∩ B| set
  * semantics (the Jaccard callers' contract); WITH duplicates the
  * merge pairs equal values one-by-one, so the count is the MULTISET
  * intersection Σ_v min(multA(v), multB(v)) — which is exactly the
  * clipped n-gram match BLEU needs (`LlmOps.bleuScore`, r12).
  * Null in → null out
  * (BinaryExpression's null-safe contract). Null ELEMENTS are not
  * expected from the hash pipelines and are treated as absent by
  * ArrayData.getLong (undefined content, never a crash).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (and with it ExpectsInputTypes' inputTypes) is
  // private[sql], so the type contract is enforced here instead
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $n = $a.numElements(), $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  private val fnName = "graft_sorted_intersect_count"

  /** Column API over the expression. Registers a temp function in the
    * session's registry on first use (idempotent — createOrReplace) so
    * the expression can be reached through the public `call_function`
    * surface without touching private[sql] Column internals. */
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => SortedIntersectCount(exprs(0), exprs(1)),
      "built-in")
    call_function(fnName, a, b)
  }
}
