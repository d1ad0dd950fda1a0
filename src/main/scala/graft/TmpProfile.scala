package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

// throwaway profiling harness — deleted before commit
object TmpProfile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def variant(probeRR: Boolean): org.apache.spark.sql.DataFrame = {
      val threshold = 0.8
      val toks0 = array_distinct(split(lower(col("text")), "\\s+"))
      val base = docs.repartition(32)
        .select(col("doc_id").as("id"), toks0.as("toks"))
        .withColumn("h1", transform(col("toks"), t => xxhash64(t)))
        .withColumn("h2", transform(col("toks"), t => xxhash64(t, lit(1))))
      val numHashes = 16; val bands = 4; val rowsPerBand = 4
      val sig = array((0 until numHashes).map { i =>
        array_min(zip_with(col("h1"), col("h2"), (a, b) => a + lit(i.toLong) * b))
      }: _*)
      val withToks = base.select(col("id"), array_distinct(col("h1")).as("toks"))
      val withSig = base.select(col("id"),
        size(array_distinct(col("h1"))).as("n"), sig.as("sig"))
      val buckets = array((0 until bands).map { b =>
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)
      val banded = withSig.select(col("id"), col("n"), buckets.as("bks"))
        .select(col("id"), col("n"), col("bks"),
          posexplode(col("bks")).as(Seq("band", "bucket")))
      val probe = if (probeRR) banded.repartition(32) else banded.repartition(col("id"))
      val candidates = probe.as("a")
        .join(broadcast(banded).as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id") &&
            least(col("a.n"), col("b.n")).cast("double") >=
              greatest(col("a.n"), col("b.n")) * threshold)
        .filter((0 until bands).map { bb =>
          col("a.band") <= bb ||
            element_at(col("a.bks"), bb + 1) =!= element_at(col("b.bks"), bb + 1)
        }.reduce(_ && _))
        .select(col("a.id").as("i"), col("b.id").as("j"))
      candidates
        .join(withToks.select(col("id").as("i"), col("toks").as("ta")), "i")
        .join(withToks.select(col("id").as("j"), col("toks").as("tb")), "j")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
        .withColumn("jac", col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")))
        .filter(col("jac") >= threshold)
        .select(col("i"), col("j"), round(col("jac"), 4).as("jac"))
    }
    variant(true).count() // warm
    for (coal <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coal)
      for (rr <- Seq(true, false); p <- 1 to 2)
        time(s"coal=$coal rr=$rr p$p")(variant(rr).count())
      for (p <- 1 to 2)
        time(s"coal=$coal current p$p")(LlmOps.nearDupPairsMinhash(docs, 0.8).count())
    }
    spark.stop()
  }
}
