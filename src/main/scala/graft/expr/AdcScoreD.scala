package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PQ asymmetric-distance (ADC) lookup-table score:
  * Σ_s table[s·ksub + codes[s]] — the per-row scoring kernel of the PQ
  * ANN probe (`LlmOps.annCosinePq` / `annCosineIvfPqIndexed`).
  *
  * The r6 implementation was a Scala UDF closing over the 2-D ADC
  * table: JIT'd loop, but each row crosses the UDF boundary (codes
  * ArrayData → boxed Seq[Int] copy) and splits the surrounding
  * whole-stage-codegen span. This expression does the m lookups INSIDE
  * codegen against the table passed as a flattened array<double>
  * LITERAL (a codegen-global constant — materialized once per task,
  * not per row), reading `ArrayData.getInt/getDouble` directly: no
  * boxing, no span break. Same shape as [[DotProductD]], which
  * measured 2.03 → 1.26 s on llm_semdedup for the identical reason.
  *
  * Contract: `codes[s]` ∈ [0, ksub) by construction (the quantizer
  * emits an argmin over ksub centroids) — out-of-range codes read as
  * undefined content of a mis-built index, not a guarded path. Null
  * codes row → null score (null-safe ternary contract). */
case class AdcScoreD(codes: Expression, table: Expression, ksub: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = table
  override def third: Expression = ksub

  override def checkInputDataTypes(): TypeCheckResult = {
    val okCodes = codes.dataType match {
      case ArrayType(IntegerType, _) => true; case _ => false
    }
    val okTable = table.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    if (okCodes && okTable && ksub.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>, int), got " +
        s"${codes.dataType.catalogString}, ${table.dataType.catalogString}, " +
        ksub.dataType.catalogString)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score_d"

  override def nullSafeEval(c: Any, t: Any, k: Any): Any = {
    val cd = c.asInstanceOf[ArrayData]
    val td = t.asInstanceOf[ArrayData]
    val kk = k.asInstanceOf[Int]
    val n = cd.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += td.getDouble(i * kk + cd.getInt(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t, k) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $c.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $t.getDouble($i * $k + $c.getInt($i));
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AdcScoreD =
    copy(codes = newFirst, table = newSecond, ksub = newThird)
}

object AdcScoreD {
  private val fnName = "graft_adc_score_d"

  /** Column API: `adc` is the driver-built m×ksub lookup table,
    * flattened row-major into an array literal. */
  def apply(spark: SparkSession, codes: Column,
            adc: Array[Array[Double]]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => AdcScoreD(exprs(0), exprs(1), exprs(2)),
      "built-in")
    val ksub = if (adc.isEmpty) 1 else adc(0).length
    call_function(fnName, codes,
      typedLit(adc.flatten.toSeq),
      org.apache.spark.sql.functions.lit(ksub))
  }
}
