package graft.kql

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Runtime for the KQL `scan` operator (sequence matching with
  * per-sequence state).
  *
  * All EXPRESSION work happens in Catalyst before this runs: the planner
  * projects one boolean column per step condition and one typed value
  * column per row-dependent assignment, so the machine below only reads
  * precomputed cells — no expression interpretation, full codegen for
  * the data-dependent math. What remains is the inherently sequential
  * bookkeeping that defines scan's semantics.
  *
  * Distribution: under `partition by` the input is hash-partitioned on
  * the key and sorted within partitions, and the machine resets at key
  * boundaries — fully parallel (the scale path). The bare serialized
  * form runs on one ordered partition, mirroring how the source system
  * executes scan (a deliberately sequential operator; the one
  * mapPartitions in the engine, with this justification).
  *
  * State model (simplified KQL default): at most one active sequence per
  * step. A record first ADVANCES sequences (step k−1 → k when cond_k
  * matches, last step included), then lets unadvanced sequences STAY at
  * a step whose condition still matches (how running aggregates
  * accumulate), then STARTS a new sequence at step 1 if none is active
  * there. Each action emits the record with the sequence's declared
  * variables (and match id when requested). Non-matching records are
  * skipped; sequences persist until replaced.
  */
object ScanExec {

  sealed trait Rhs extends Serializable
  /** var := precomputed row value (column index). */
  final case class SetRow(colIdx: Int) extends Rhs
  /** var := srcVar + precomputed row value. */
  final case class AddVar(srcVar: Int, colIdx: Int) extends Rhs
  /** var := srcVar. */
  final case class CarryVar(srcVar: Int) extends Rhs

  def run(df: DataFrame, outSchema: StructType, width: Int, nSteps: Int,
          condBase: Int, assigns: Array[Array[Option[Rhs]]],
          defaults: Array[Any], isLong: Array[Boolean],
          keyIdx: Option[Int], emitMatchId: Boolean): DataFrame = {
    val s = nSteps
    val v = defaults.length
    val outLen = width + v + (if (emitMatchId) 1 else 0)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      val states = Array.fill[Option[(Array[Any], Long)]](s)(None)
      var seqCounter = 0L
      var prevKey: Any = null
      var sawRow = false
      it.flatMap { r =>
        keyIdx.foreach { ki =>
          val k = if (r.isNullAt(ki)) null else r.get(ki)
          if (!sawRow || k != prevKey) {
            var i = 0; while (i < s) { states(i) = None; i += 1 }
            seqCounter = 0L
          }
          prevKey = k; sawRow = true
        }
        val out = scala.collection.mutable.ArrayBuffer[Row]()
        def cond(k: Int): Boolean = {
          val i = condBase + k; !r.isNullAt(i) && r.getBoolean(i)
        }
        def add(a: Any, b: Any, long: Boolean): Any =
          if (a == null || b == null) null
          else if (long) a.asInstanceOf[Number].longValue + b.asInstanceOf[Number].longValue
          else a.asInstanceOf[Number].doubleValue + b.asInstanceOf[Number].doubleValue
        def applyAssigns(k: Int, vars: Array[Any]): Array[Any] = {
          val nv = vars.clone()
          var vi = 0
          while (vi < v) {
            assigns(k)(vi) match {
              case Some(SetRow(ci)) => nv(vi) = if (r.isNullAt(ci)) null else r.get(ci)
              case Some(AddVar(sv, ci)) =>
                nv(vi) = add(vars(sv), if (r.isNullAt(ci)) null else r.get(ci), isLong(vi))
              case Some(CarryVar(sv)) => nv(vi) = vars(sv)
              case None => ()
            }
            vi += 1
          }
          nv
        }
        def emit(vars: Array[Any], mid: Long): Unit = {
          val cells = new Array[Any](outLen)
          var i = 0
          while (i < width) { cells(i) = if (r.isNullAt(i)) null else r.get(i); i += 1 }
          var vi = 0
          while (vi < v) { cells(width + vi) = vars(vi); vi += 1 }
          if (emitMatchId) cells(width + v) = mid
          out += Row.fromSeq(cells.toIndexedSeq)
        }
        val emitted = new Array[Boolean](s)
        var k = s - 1
        while (k >= 1) { // advance k-1 → k
          if (states(k - 1).isDefined && cond(k)) {
            val (v0, mid) = states(k - 1).get
            val v1 = applyAssigns(k, v0)
            states(k) = Some((v1, mid)); states(k - 1) = None
            emitted(k) = true
            emit(v1, mid)
          }
          k -= 1
        }
        k = 0
        while (k < s) { // stay
          if (!emitted(k) && states(k).isDefined && cond(k)) {
            val (v0, mid) = states(k).get
            val v1 = applyAssigns(k, v0)
            states(k) = Some((v1, mid))
            emitted(k) = true
            emit(v1, mid)
          }
          k += 1
        }
        if (!emitted(0) && states(0).isEmpty && cond(0)) { // start
          seqCounter += 1
          val v1 = applyAssigns(0, defaults.clone())
          states(0) = Some((v1, seqCounter))
          emit(v1, seqCounter)
        }
        out
      }
    }(enc)
  }
}
