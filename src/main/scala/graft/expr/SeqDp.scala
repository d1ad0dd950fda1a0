package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Shared contract for the two sequence-DP kernels: two token-hash
  * arrays in, one Int out, rolling single-row DP in a tight codegen
  * loop over primitive longs.
  *
  * Why expressions (r13): ROUGE-L's LCS and WER's edit distance
  * shipped in r12 as nested `aggregate` folds — the only Column-API
  * shape that can carry the left-neighbor dependency — but an
  * interpreted fold rebuilds an immutable row PER CELL, making the
  * real cost O(n·m²) allocations (the r12 notes bounded bench tokens
  * to 40 because of it). The rolling-array loop here is the textbook
  * O(n·m) with two primitive buffers, inside whole-stage codegen.
  * Inputs are xxhash64 token arrays (equality pattern is all the DP
  * needs; same 1e-16 collision class the BLEU kernel accepts).
  * Null in → null out. */
abstract class SeqDpBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull = false only: ArrayData.getLong reads a null slot as
    // 0, so a nullable-element array would DP over silently wrong
    // values for SQL callers (internal callers hash via xxhash64,
    // which never yields null elements)
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments with non-null " +
        s"elements, got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = IntegerType
}

/** Longest-common-subsequence LENGTH of two long arrays. */
case class LcsLength(left: Expression, right: Expression) extends SeqDpBase {
  override def prettyName: String = "lcs_length"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val prev = new Array[Int](m + 1); val cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val xi = x.getLong(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (xi == y.getLong(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xi = ctx.freshName("xi"); val t = ctx.freshName("t")
      s"""
         |final int $n = $a.numElements(), $m = $b.numElements();
         |int[] $prev = new int[$m + 1];
         |int[] $cur = new int[$m + 1];
         |for (int $i = 1; $i <= $n; $i++) {
         |  final long $xi = $a.getLong($i - 1);
         |  for (int $j = 1; $j <= $m; $j++) {
         |    $cur[$j] = ($xi == $b.getLong($j - 1))
         |      ? $prev[$j - 1] + 1
         |      : Math.max($prev[$j], $cur[$j - 1]);
         |  }
         |  final int[] $t = $prev; $prev = $cur; $cur = $t;
         |}
         |${ev.value} = $prev[$m];
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  private val fnName = "graft_lcs_length"
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => LcsLength(exprs(0), exprs(1)), "built-in")
    call_function(fnName, a, b)
  }
}

/** Levenshtein edit distance (unit costs) of two long arrays. */
case class EditDistanceLong(left: Expression, right: Expression)
    extends SeqDpBase {
  override def prettyName: String = "edit_distance_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val prev = new Array[Int](m + 1); val cur = new Array[Int](m + 1)
    var j0 = 0
    while (j0 <= m) { prev(j0) = j0; j0 += 1 }
    var i = 1
    while (i <= n) {
      val xi = x.getLong(i - 1)
      cur(0) = i
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (xi == y.getLong(j - 1)) 0 else 1)
        cur(j) = math.min(sub, math.min(prev(j) + 1, cur(j - 1) + 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xi = ctx.freshName("xi"); val t = ctx.freshName("t")
      val sub = ctx.freshName("sub")
      s"""
         |final int $n = $a.numElements(), $m = $b.numElements();
         |int[] $prev = new int[$m + 1];
         |int[] $cur = new int[$m + 1];
         |for (int $j = 0; $j <= $m; $j++) $prev[$j] = $j;
         |for (int $i = 1; $i <= $n; $i++) {
         |  final long $xi = $a.getLong($i - 1);
         |  $cur[0] = $i;
         |  for (int $j = 1; $j <= $m; $j++) {
         |    final int $sub = $prev[$j - 1]
         |      + (($xi == $b.getLong($j - 1)) ? 0 : 1);
         |    $cur[$j] = Math.min($sub,
         |      Math.min($prev[$j] + 1, $cur[$j - 1] + 1));
         |  }
         |  final int[] $t = $prev; $prev = $cur; $cur = $t;
         |}
         |${ev.value} = $prev[$m];
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistanceLong =
    copy(left = newLeft, right = newRight)
}

object EditDistanceLong {
  private val fnName = "graft_edit_distance"
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => EditDistanceLong(exprs(0), exprs(1)), "built-in")
    call_function(fnName, a, b)
  }
}
