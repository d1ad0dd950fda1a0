package graft.kql

import org.apache.spark.sql.{DataFrame, Encoders, Row}
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
  * Streaming: [[runStream]] carries the same machine through
  * `flatMapGroupsWithState` — one state entry per partition key, rows
  * sorted within each micro-batch. Cross-batch order is the source's
  * responsibility (the standard streaming-sequence-matching contract:
  * per-key in-order delivery, e.g. a partitioned log).
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

  /** Kryo-serialized per-key machine state for the streaming path. */
  final case class ScanState(active: Array[Boolean], vars: Array[Array[Any]],
                             mids: Array[Long], seq: Long)

  /** The step machine, one instance per partition (batch) or key
    * (streaming). Not thread-safe; `feed` is called once per in-order
    * record. */
  final class Machine(nSteps: Int, width: Int, condBase: Int,
                      assigns: Array[Array[Option[Rhs]]], defaults: Array[Any],
                      isLong: Array[Boolean], emitMatchId: Boolean)
      extends Serializable {
    private val v = defaults.length
    private val outLen = width + v + (if (emitMatchId) 1 else 0)
    private var states = Array.fill[Option[(Array[Any], Long)]](nSteps)(None)
    private var seqCounter = 0L

    def reset(): Unit = {
      var i = 0; while (i < nSteps) { states(i) = None; i += 1 }
      seqCounter = 0L
    }

    def snapshot: ScanState = ScanState(
      states.map(_.isDefined),
      states.map(_.map(_._1).getOrElse(Array.empty[Any])),
      states.map(_.map(_._2).getOrElse(0L)), seqCounter)

    def load(s: ScanState): Unit = {
      states = Array.tabulate(nSteps)(i =>
        if (s.active(i)) Some((s.vars(i), s.mids(i))) else None)
      seqCounter = s.seq
    }

    def feed(r: Row): scala.collection.Seq[Row] = {
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
      val emitted = new Array[Boolean](nSteps)
      var k = nSteps - 1
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
      while (k < nSteps) { // stay
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
  }

  def run(df: DataFrame, outSchema: StructType, width: Int, nSteps: Int,
          condBase: Int, assigns: Array[Array[Option[Rhs]]],
          defaults: Array[Any], isLong: Array[Boolean],
          keyIdx: Option[Int], emitMatchId: Boolean): DataFrame = {
    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      val m = new Machine(nSteps, width, condBase, assigns, defaults,
        isLong, emitMatchId)
      var prevKey: Any = null
      var sawRow = false
      it.flatMap { r =>
        keyIdx.foreach { ki =>
          val k = if (r.isNullAt(ki)) null else r.get(ki)
          if (!sawRow || k != prevKey) m.reset()
          prevKey = k; sawRow = true
        }
        m.feed(r)
      }
    }(enc)
  }

  /** Streaming `scan ... partition by key`: one state entry per key via
    * `flatMapGroupsWithState` (SURVEY §2.10 arbitrary streaming state).
    * Rows are sorted by the declared order columns WITHIN each
    * micro-batch; the machine state (active sequences, variables, match
    * counter) persists across batches, so a sequence can start in one
    * batch and complete many batches later. Keys and state ride a kryo
    * encoder (the state holds type-erased variable cells). */
  def runStream(df: DataFrame, outSchema: StructType, width: Int, nSteps: Int,
                condBase: Int, assigns: Array[Array[Option[Rhs]]],
                defaults: Array[Any], isLong: Array[Boolean],
                keyIdx: Int, emitMatchId: Boolean,
                orderIdx: Array[Int], orderAsc: Array[Boolean]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val outEnc = Encoders.row(outSchema)
    val keyEnc = Encoders.kryo[AnyRef]
    val stateEnc = Encoders.kryo[ScanState]
    val ord = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        var i = 0
        while (i < orderIdx.length) {
          val ci = orderIdx(i)
          val (an, bn) = (a.isNullAt(ci), b.isNullAt(ci))
          val c =
            if (an && bn) 0
            else if (an) -1 // nulls first on asc (KQL)
            else if (bn) 1
            else a.get(ci).asInstanceOf[Comparable[Any]].compareTo(b.get(ci))
          val signed = if (orderAsc(i)) c else -c
          if (signed != 0) return signed
          i += 1
        }
        0
      }
    }
    val func = (_: AnyRef, rows: Iterator[Row], state: GroupState[ScanState]) => {
      val m = new Machine(nSteps, width, condBase, assigns, defaults,
        isLong, emitMatchId)
      if (state.exists) m.load(state.get)
      val sorted = rows.toArray
      java.util.Arrays.sort(sorted, ord)
      // materialize before state.update — feed mutates the machine
      val out = sorted.iterator.flatMap(m.feed).toArray
      state.update(m.snapshot)
      out.iterator
    }
    df.groupByKey(r => if (r.isNullAt(keyIdx)) null else r.get(keyIdx).asInstanceOf[AnyRef])(keyEnc)
      .flatMapGroupsWithState[ScanState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(func)(stateEnc, outEnc)
  }
}
