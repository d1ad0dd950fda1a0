package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-maintenance and reconciliation operators — the ops layer a
  * 100 TB lakehouse table needs around the query engine: snapshot
  * diffing for ingest validation and small-file compaction planning
  * (the Delta/Iceberg OPTIMIZE bin-pack step), both deterministic and
  * value-exact so they oracle-check cross-engine.
  */
object TableOps {

  /** Snapshot reconciliation: classify every key as added / removed /
    * changed / unchanged between two versions of a table (ingest
    * validation, CDC audit, migration sign-off). Keys are assumed
    * unique per side (the primary-key contract every CDC diff needs).
    *
    * Row identity = md5 over the null-tagged stringified non-key
    * columns in sorted-name order (`concat_ws` silently SKIPS nulls,
    * so every part is coalesced to a \u0000 sentinel first; Spark's
    * double→string is shortest-roundtrip, hence injective). The hash
    * is only ever compared Spark-side — cross-engine oracles compare
    * the columns directly, which is the stronger check.
    *
    * Scale shape: ONE full-outer shuffle join on the key — both sides
    * hash-partition by key, no windows, no skew beyond the key's own
    * distribution. The hash projection collapses arbitrarily wide rows
    * to 32 bytes before the shuffle, so the exchange moves keys +
    * digests, not payloads. */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "tableDiff: need at least one key column")
    def digest(df: DataFrame, out: String): DataFrame = {
      val cmp = df.columns.filterNot(keys.contains).sorted
      val h =
        if (cmp.isEmpty) lit("")
        else md5(concat_ws("\u0001", cmp.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000"))): _*))
      df.select(keys.map(col) :+ h.as(out): _*)
    }
    digest(oldDf, "__h_old")
      .join(digest(newDf, "__h_new"), keys, "full_outer")
      .withColumn("status",
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__h_old", "__h_new")
  }

  /** CDC MERGE apply (r8) — the write-side complement of [[tableDiff]]:
    * upsert a change batch into a snapshot. Rows whose key appears in
    * `changes` take the change row (update or insert); every other old
    * row passes through. Optionally, change rows with `deleteCol` true
    * are TOMBSTONES: their key is removed and the tombstone itself is
    * not emitted — the Delta/Iceberg MERGE WHEN MATCHED THEN
    * UPDATE/DELETE + WHEN NOT MATCHED THEN INSERT triple in one pass.
    *
    * Scale shape: ONE left-anti shuffle join (old vs change keys — both
    * sides hash-partition by key) + a union with the non-tombstone
    * changes. No windows, no driver state; the change batch is
    * typically small enough that Catalyst broadcasts the anti-join
    * build side on its own. */
  def mergeUpsert(oldDf: DataFrame, changes: DataFrame, keys: Seq[String],
                  deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert: need at least one key column")
    val survivors = oldDf.join(
      changes.select(keys.map(col): _*), keys, "left_anti")
    val applied = deleteCol match {
      case Some(d) => changes.filter(!coalesce(col(d), lit(false))).drop(d)
      case None => changes
    }
    survivors.unionByName(applied)
  }

  /** Tukey-fence outlier detection per group over an INTEGER measure
    * (cents/micros) — the classical numeric-column cleaning rule.
    * Quartiles are NEAREST-RANK (value at row ceil(p·n) of the
    * group-sorted order — no interpolation, so everything stays in
    * integer arithmetic and the fences replay value-exact in SQL);
    * fences = q1 − (3·iqr) div 2 and q3 + (3·iqr) div 2 (k = 1.5 in
    * halves). Emits one row per group: sizes, quartiles, fences, and
    * the outlier count.
    *
    * Scale shape: one per-GROUP sort window (partitioned by the group
    * key — never a global single-partition window) + two broadcast
    * joins of group-level stats back onto the rows. Group cardinality
    * bounds the broadcast; row work is one sort shuffle + one
    * aggregate. */
  def iqrOutliers(df: DataFrame, valCol: String, byCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = df.select(col(byCol).as("g"), col(valCol).cast("long").as("v"))
    val ranked = t.withColumn("r",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("v")))
        .cast("long"))
    val ns = t.groupBy("g").agg(count(lit(1)).as("n"))
    val quarts = ranked.join(broadcast(ns), Seq("g"))
      .withColumn("r25", expr("CAST(ceil(0.25 * n) AS BIGINT)"))
      .withColumn("r75", expr("CAST(ceil(0.75 * n) AS BIGINT)"))
      .groupBy("g")
      .agg(min(when(col("r") === col("r25"), col("v"))).as("p25"),
        min(when(col("r") === col("r75"), col("v"))).as("p75"))
      .withColumn("iqr", col("p75") - col("p25"))
      .withColumn("lo_fence", expr("p25 - (3L * iqr) div 2"))
      .withColumn("hi_fence", expr("p75 + (3L * iqr) div 2"))
    t.join(broadcast(quarts), Seq("g"))
      .groupBy(col("g"), col("p25"), col("p75"), col("lo_fence"),
        col("hi_fence"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo_fence") || col("v") > col("hi_fence"),
          1L).otherwise(0L)).as("n_outliers"))
      .select(col("g").as(byCol), col("n"), col("p25"), col("p75"),
        col("lo_fence"), col("hi_fence"), col("n_outliers"))
  }

  /** Small-file compaction planner: assign files to target-size output
    * groups. Rule = sorted next-fit — files in (size desc, id asc)
    * order, bin = floor(prefix_bytes_before / target) — which is
    * deterministic and replayable as one SQL window (first-fit-
    * decreasing would pack marginally tighter but its per-bin state is
    * inherently sequential and engine-specific). Every bin lands
    * within one max-file-size of the target except the last.
    *
    * The input is FILE METADATA — one row per file, ~10⁶ rows even for
    * a 100 TB table at 128 MB files — but the running sum still goes
    * through the two-phase distributed GlobalWindow (range partition →
    * per-partition sum → ≤P-row broadcast prefix offsets) rather than
    * a single-partition window, so a pathological million-file listing
    * never serializes onto one task. */
  def compactPlan(files: DataFrame, sizeCol: String, idCol: String,
                  targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "compactPlan: targetBytes must be positive")
    import graft.kql.GlobalWindow
    val ordered = Seq(col(sizeCol).desc, col(idCol).asc)
    val cum = GlobalWindow.compute(files, ordered,
      Seq(col(sizeCol), col(idCol)),
      Seq(GlobalWindow.CumSum("__cp_cum", col(sizeCol).cast("long"))),
      preRanged = false)
    cum.withColumn("bin",
        expr(s"(__cp_cum - `$sizeCol`) div ${targetBytes}"))
      .drop("__cp_cum")
  }
}
