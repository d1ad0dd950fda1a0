package graft.kql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ("serialized") window computation.
  *
  * KQL's serialized functions (row_number, prev/next, row_cumsum,
  * row_rank_min/dense, ntile, percent_rank) are defined over ONE total
  * row order. The naive Spark translation — `Window.orderBy(...)` with no
  * partitionBy — moves the whole table through a single task: correct,
  * and catastrophic at 100× scale. This is the classic two-phase
  * alternative:
  *
  *  1. range-repartition by the sort key (skipped when the input is
  *     already range-laid-out, e.g. straight after a global sort);
  *  2. compute the function per partition
  *     (`Window.partitionBy(partition-id)` — a parallel hash exchange);
  *  3. close the cross-partition gap with per-partition aggregates:
  *     prefix row counts / sums / distinct-key counts over ≤ P stat rows,
  *     broadcast back as offsets. Ties never span partitions (the range
  *     partitioner routes equal keys to one partition), so local
  *     rank/dense_rank + a prefix offset is exact.
  *  4. for lag/lead, each partition's first/last `n` rows are joined
  *     (broadcast, on global position) against the neighbors that need
  *     them across the boundary.
  *
  * The only single-partition window in the plan runs over the ≤ P
  * per-partition stat rows — never over data. Global positions are
  * long arithmetic on prefix counts (exact to 2^63 rows); ntile's
  * bucket math goes through floor() on doubles, exact below 2^53 rows.
  */
object GlobalWindow {

  sealed trait Call { def out: String }
  final case class RowNumber(out: String, startAt: Option[Column]) extends Call
  final case class RankMin(out: String) extends Call
  final case class DenseRank(out: String) extends Call
  final case class PercentRank(out: String) extends Call
  final case class NTile(out: String, n: Int) extends Call
  final case class CumSum(out: String, arg: Column) extends Call
  final case class Lag(out: String, arg: Column, n: Int, default: Option[Column]) extends Call
  final case class Lead(out: String, arg: Column, n: Int, default: Option[Column]) extends Call

  /** @param ordered   sort-order columns (asc/desc-wrapped) defining the
    *                  serialized order
    * @param keys      the same keys unordered (dense_rank's distinct
    *                  tuple count)
    * @param preRanged input partitions already respect `ordered` (e.g.
    *                  straight after `orderBy`) — skip the range shuffle */
  def compute(df: DataFrame, ordered: Seq[Column], keys: Seq[Column],
              calls: Seq[Call], preRanged: Boolean): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // explicit partition count: AQE must not re-coalesce this exchange
    // differently across the reused subtrees below (pid consistency)
    val ranged = if (preRanged) df else df.repartitionByRange(p, ordered: _*)
    val dfp = ranged.withColumn("__gw_pid", spark_partition_id().cast("long"))
    val w = Window.partitionBy(col("__gw_pid")).orderBy(ordered: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // lag/lead with n == 1 over an all-ascending order (the dominant
    // case: prev(x)/next(x) after `sort by ... asc`) needs no per-call
    // edge pass at all — each partition's FIRST/LAST row value rides the
    // stats aggregate as max/min over struct(sort keys, arg), and the
    // neighbor's value arrives through the same broadcast offsets join
    // every call already pays for. Per avoided call that removes one
    // full-data window pass and one broadcast join (q18 went from three
    // data window passes to one). n > 1 or descending keys fall back to
    // the per-call edge join below.
    val allAsc = ordered.forall(
      org.apache.spark.sql.graft.ColumnSortShim.isAscendingNullsFirst)
    def statEdge(c: Call): Boolean = c match {
      case Lag(_, _, 1, _) | Lead(_, _, 1, _) => allAsc
      case _ => false
    }

    // ---- phase A: per-partition stats → prefix offsets (≤ p rows)
    val aggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)).as("__gw_cnt"))
    calls.zipWithIndex.foreach {
      case (CumSum(_, arg), i) =>
        aggs += sum(arg).as(s"__gw_s$i"); aggs += count(arg).as(s"__gw_c$i")
      case (DenseRank(_), i) =>
        aggs += count_distinct(struct(keys: _*)).as(s"__gw_d$i")
      case (c @ Lag(_, arg, _, _), i) if statEdge(c) =>
        aggs += max(struct((keys :+ arg.as("__gw_a")): _*))
          .getField("__gw_a").as(s"__gw_last$i")
      case (c @ Lead(_, arg, _, _), i) if statEdge(c) =>
        aggs += min(struct((keys :+ arg.as("__gw_a")): _*))
          .getField("__gw_a").as(s"__gw_first$i")
      case _ => ()
    }
    val stats = dfp.groupBy(col("__gw_pid")).agg(aggs.head, aggs.tail.toSeq: _*)
    val wp = Window.orderBy(col("__gw_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val wt = Window.orderBy(col("__gw_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wn = Window.orderBy(col("__gw_pid"))
    var off = stats
      .withColumn("__gw_off", coalesce(sum(col("__gw_cnt")).over(wp), lit(0L)))
      .withColumn("__gw_tot", sum(col("__gw_cnt")).over(wt))
    calls.zipWithIndex.foreach {
      case (_: CumSum, i) =>
        off = off
          .withColumn(s"__gw_soff$i", sum(col(s"__gw_s$i")).over(wp))
          .withColumn(s"__gw_coff$i", coalesce(sum(col(s"__gw_c$i")).over(wp), lit(0L)))
      case (_: DenseRank, i) =>
        off = off.withColumn(s"__gw_doff$i", coalesce(sum(col(s"__gw_d$i")).over(wp), lit(0L)))
      case (c: Lag, i) if statEdge(c) =>
        // the previous NON-EMPTY partition's last row value (stats has no
        // rows for empty partitions, so lag(1) skips them — exactly the
        // true predecessor row)
        off = off.withColumn(s"__gw_plast$i", lag(col(s"__gw_last$i"), 1).over(wn))
      case (c: Lead, i) if statEdge(c) =>
        off = off.withColumn(s"__gw_pfirst$i", lead(col(s"__gw_first$i"), 1).over(wn))
      case _ => ()
    }
    val offCols = Seq(col("__gw_pid"), col("__gw_cnt"), col("__gw_off"), col("__gw_tot")) ++
      calls.zipWithIndex.flatMap {
        case (_: CumSum, i) => Seq(col(s"__gw_soff$i"), col(s"__gw_coff$i"))
        case (_: DenseRank, i) => Seq(col(s"__gw_doff$i"))
        case (c: Lag, i) if statEdge(c) => Seq(col(s"__gw_plast$i"))
        case (c: Lead, i) if statEdge(c) => Seq(col(s"__gw_pfirst$i"))
        case _ => Nil
      }

    // ---- phase B: local windows + broadcast offsets
    var out = dfp.join(broadcast(off.select(offCols: _*)), Seq("__gw_pid"), "left")
      .withColumn("__gw_lrn", row_number().over(w).cast("long"))
      .withColumn("__gw_gp", col("__gw_off") + col("__gw_lrn"))

    calls.zipWithIndex.foreach { case (call, i) =>
      call match {
        case RowNumber(o, startAt) =>
          val base = col("__gw_gp")
          out = out.withColumn(o,
            startAt.map(s => base + s.cast("long") - lit(1L)).getOrElse(base))

        case RankMin(o) =>
          out = out.withColumn(o, rank().over(w).cast("long") + col("__gw_off"))

        case DenseRank(o) =>
          out = out.withColumn(o,
            dense_rank().over(w).cast("long") + col(s"__gw_doff$i"))

        case PercentRank(o) =>
          val gr = rank().over(w).cast("long") + col("__gw_off")
          out = out.withColumn(o,
            when(col("__gw_tot") > 1L,
              (gr - 1L).cast("double") / (col("__gw_tot") - 1L).cast("double"))
              .otherwise(lit(0.0)))

        case NTile(o, n) =>
          // SQL NTILE: first (tot % n) buckets take ceil(tot/n) rows
          val tot = col("__gw_tot"); val gp = col("__gw_gp")
          val q = floor(tot / n).cast("long")
          val rem = pmod(tot, lit(n.toLong))
          val cut = (q + 1L) * rem
          out = out.withColumn(o,
            when(gp <= cut, floor((gp - 1L) / (q + 1L)).cast("long") + 1L)
              .otherwise(rem + floor((gp - cut - 1L) / q).cast("long") + 1L))

        case CumSum(o, arg) =>
          val local = sum(arg).over(wRun)
          // hasPrior = a non-null arg exists in an earlier partition;
          // without it, all-null prefixes would turn null into 0
          val hasPrior = col(s"__gw_coff$i") > 0L
          out = out.withColumn(o,
            when(hasPrior, coalesce(local, lit(0)) + col(s"__gw_soff$i"))
              .otherwise(local))

        case c @ Lag(o, arg, _, default) if statEdge(c) =>
          // boundary value came in with the broadcast offsets; a prior
          // row exists iff the prefix count is positive
          out = out.withColumn(o,
            when(col("__gw_lrn") > 1L, lag(arg, 1).over(w))
              .otherwise(when(col("__gw_off") > 0L, col(s"__gw_plast$i"))
                .otherwise(default.getOrElse(lit(null)))))

        case c @ Lead(o, arg, _, default) if statEdge(c) =>
          out = out.withColumn(o,
            when(col("__gw_lrn") <= col("__gw_cnt") - 1L, lead(arg, 1).over(w))
              .otherwise(when(col("__gw_off") + col("__gw_cnt") < col("__gw_tot"),
                col(s"__gw_pfirst$i"))
                .otherwise(default.getOrElse(lit(null)))))

        case Lag(o, arg, n, default) =>
          // edge rows: each partition's last n rows, keyed by the global
          // position of the row that consumes them (their gp + n)
          val edges = dfp
            .withColumn("__gw_lrn0", row_number().over(w).cast("long"))
            .join(broadcast(off.select(col("__gw_pid"), col("__gw_cnt"), col("__gw_off"))),
              Seq("__gw_pid"))
            .filter(col("__gw_lrn0") > col("__gw_cnt") - n)
            .select((col("__gw_off") + col("__gw_lrn0") + lit(n.toLong)).as(s"__gw_egp$i"),
              arg.as(s"__gw_ev$i"), lit(true).as(s"__gw_ef$i"))
          out = out.join(broadcast(edges), col("__gw_gp") === col(s"__gw_egp$i"), "left")
            .withColumn(o,
              when(col("__gw_lrn") > n, lag(arg, n).over(w))
                .otherwise(when(col(s"__gw_ef$i"), col(s"__gw_ev$i"))
                  .otherwise(default.getOrElse(lit(null)))))
            .drop(s"__gw_egp$i", s"__gw_ev$i", s"__gw_ef$i")

        case Lead(o, arg, n, default) =>
          val edges = dfp
            .withColumn("__gw_lrn0", row_number().over(w).cast("long"))
            .join(broadcast(off.select(col("__gw_pid"), col("__gw_off"))), Seq("__gw_pid"))
            .filter(col("__gw_lrn0") <= n)
            .select((col("__gw_off") + col("__gw_lrn0") - lit(n.toLong)).as(s"__gw_egp$i"),
              arg.as(s"__gw_ev$i"), lit(true).as(s"__gw_ef$i"))
          out = out.join(broadcast(edges), col("__gw_gp") === col(s"__gw_egp$i"), "left")
            .withColumn(o,
              when(col("__gw_lrn") <= col("__gw_cnt") - n, lead(arg, n).over(w))
                .otherwise(when(col(s"__gw_ef$i"), col(s"__gw_ev$i"))
                  .otherwise(default.getOrElse(lit(null)))))
            .drop(s"__gw_egp$i", s"__gw_ev$i", s"__gw_ef$i")
      }
    }

    val temps = Seq("__gw_pid", "__gw_lrn", "__gw_gp", "__gw_cnt", "__gw_off", "__gw_tot") ++
      calls.zipWithIndex.flatMap {
        case (_: CumSum, i) => Seq(s"__gw_soff$i", s"__gw_coff$i")
        case (_: DenseRank, i) => Seq(s"__gw_doff$i")
        case (c: Lag, i) if statEdge(c) => Seq(s"__gw_plast$i")
        case (c: Lead, i) if statEdge(c) => Seq(s"__gw_pfirst$i")
        case _ => Nil
      }
    out.drop(temps: _*)
  }
}
