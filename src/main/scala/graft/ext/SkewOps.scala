package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities.
  *
  * AQE's skew-join split handles sort-merge partitions it can see, but
  * it cannot split a single hot KEY across tasks when the key's rows
  * must meet matching build rows — salting can: append a salt ∈ [0, s)
  * to the BIG side derived from each row's full content (deterministic,
  * no rand()), replicate the small/dim side s times, and join on
  * (key, salt). A hot key's rows now spread over s shuffle partitions;
  * the dim replication is s× a small table. Semantics are exactly the
  * plain join for inner / left_outer / left_semi / left_anti (each left
  * row matches the single replica carrying its own salt), which is why
  * those are the only kinds accepted — right/full would see the
  * replicated right rows. */
object SkewOps {

  private val okKinds =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Join `left` (big, possibly key-skewed) to `right` (small) on
    * equal-named `key`, spreading each left key over `salts` shuffle
    * partitions. The salt is a hash of the whole left row, so identical
    * rows co-locate (harmless) and the assignment is deterministic
    * across runs and task layouts. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts >= 1 && salts <= 4096, s"saltedJoin: bad salts=$salts")
    require(okKinds.contains(joinType.toLowerCase),
      s"saltedJoin: $joinType would duplicate the replicated right side; " +
        "use inner/left_outer/left_semi/left_anti")
    val lsalt = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val rsalt = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val joined = lsalt.join(rsalt, Seq(key, "__salt"), joinType)
    joined.drop("__salt")
  }
}
