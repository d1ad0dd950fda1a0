package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Gradient-sign perceptual hash (dHash) over a raw byte grid: bit
  * (r, c) = [byte(r·cols+c) < byte(r·cols+c+1)] for c < cols−1, packed
  * little-endian into one long at position r·(cols−1)+c. rows=8/cols=9
  * is the image 9×8 form (64 bits, bit 63 = the sign bit — two's
  * complement exact); rows=1/cols=65 is the audio energy-envelope
  * form. Bytes compare UNSIGNED (grayscale/energy values).
  *
  * Why an expression (r14, the SortedGramHashes convention): the
  * Column form read the grid through `hex(...)` + 72×
  * `conv(substring(...))` — a ~500-node tree per row that dominated
  * the llm_image_neardup bench row's analyzer+eval cost. This is one
  * tight codegen loop over the payload bytes.
  *
  * Null in → null out; payload shorter than rows·cols bytes → null
  * (not-an-image); longer payloads hash their leading grid (a longer
  * envelope is still an envelope). rows/cols must be foldable ints
  * with 1 ≤ rows·(cols−1) ≤ 64. */
case class DhashBits(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${first.dataType.catalogString}")
    else if (second.dataType != IntegerType || !second.foldable ||
             third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable int rows/cols")
    else {
      val r = second.eval(); val c = third.eval()
      if (r == null || c == null || r.asInstanceOf[Int] < 1 ||
          c.asInstanceOf[Int] < 2 ||
          r.asInstanceOf[Int] * (c.asInstanceOf[Int] - 1) > 64)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs rows >= 1, cols >= 2, rows*(cols-1) <= 64")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash_bits"

  @transient private lazy val rows: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val cols: Int = third.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val b = first.eval(input)
    if (b == null) return null
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.length < rows * cols) return null
    var h = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        if ((bytes(r * cols + c) & 0xFF) < (bytes(r * cols + c + 1) & 0xFF))
          h |= 1L << (r * (cols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = first.genCode(ctx)
    val bytes = ctx.freshName("bytes")
    val r = ctx.freshName("r"); val c = ctx.freshName("c")
    val h = ctx.freshName("h")
    ev.copy(code = code"""
      ${b.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${b.isNull}) {
        byte[] $bytes = ${b.value};
        if ($bytes.length >= ${rows * cols}) {
          ${ev.isNull} = false;
          long $h = 0L;
          for (int $r = 0; $r < $rows; $r++) {
            for (int $c = 0; $c < ${cols - 1}; $c++) {
              if (($bytes[$r * $cols + $c] & 0xFF) < ($bytes[$r * $cols + $c + 1] & 0xFF))
                $h |= 1L << ($r * ${cols - 1} + $c);
            }
          }
          ${ev.value} = $h;
        }
      }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DhashBits =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DhashBits {
  private val fnName = "graft_dhash_bits"

  /** Column API over the expression (the SortedGramHashes registration
    * pattern). */
  def apply(spark: SparkSession, bin: Column, rows: Int, cols: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => DhashBits(exprs(0), exprs(1), exprs(2)),
      "built-in")
    call_function(fnName, bin,
      org.apache.spark.sql.functions.lit(rows),
      org.apache.spark.sql.functions.lit(cols))
  }
}
