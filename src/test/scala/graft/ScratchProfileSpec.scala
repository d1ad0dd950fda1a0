package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ad-hoc profiling probe (not part of the suite contract): stage-level
  * timings for llm_pipeline_v2 at sf0.1. Run explicitly with
  *   sbt 'testOnly graft.ScratchProfileSpec'
  * Skipped unless GRAFT_SCRATCH_PROFILE=1 so `sbt test` stays fast. */
class ScratchProfileSpec extends AnyFunSuite {
  private val enabled = sys.env.get("GRAFT_SCRATCH_PROFILE").contains("1")

  test("op probes at sf0.1") {
    assume(enabled)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $label%-24s best=${ts.min}%6.3f runs=${ts.map(t => f"$t%5.3f").mkString(",")}")
    }
    time("dsirResample") {
      noop(ext.LlmOps.dsirResample(d, d.filter(col("lang") === "en"), k = 200))
      ext.LlmOps.releaseCaches()
    }
    time("sourceSimilarity") {
      noop(ext.LlmOps.sourceSimilarity(d))
      ext.LlmOps.releaseCaches()
    }
    time("stupidBackoff") {
      noop(ext.LlmOps.stupidBackoff(d))
      ext.LlmOps.releaseCaches()
    }
    time("pmiContexts2") {
      noop(ext.LlmOps.pmiContexts(d, window = 2, minCount = 2, k = 5))
      ext.LlmOps.releaseCaches()
    }
    spark.stop()
  }

  test("pipeline_v2 stage timings at sf0.1") {
    assume(enabled)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def relined10(df: org.apache.spark.sql.DataFrame) = {
      val toks = split(coalesce(col("text"), lit("")), "\\s+")
      df.withColumn("text", array_join(transform(
        sequence(lit(0), floor((size(toks) - 1) / lit(10)).cast("int")),
        k => array_join(slice(toks, k * 10 + 1, lit(10)), " ")), "\n"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      // warm + 2 timed, report best
      body
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $label%-28s best=${ts.min}%6.3f  runs=${ts.map(t => f"$t%5.3f").mkString(",")}")
    }
    time("relined10") { noop(relined10(d)) }
    time("bp") {
      noop(ext.LlmOps.boilerplateRemove(relined10(d), minDf = 3))
    }
    time("bp+ld") {
      val bp = ext.LlmOps.boilerplateRemove(relined10(d), minDf = 3)
      noop(ext.LlmOps.lineDedup(bp.select(col("doc_id"), col("clean_text").as("text"))))
    }
    time("bp+ld+norm") {
      val bp = ext.LlmOps.boilerplateRemove(relined10(d), minDf = 3)
      val ld = ext.LlmOps.lineDedup(bp.select(col("doc_id"), col("clean_text").as("text")))
      noop(ext.LlmOps.textNormalize(ld.select(col("doc_id"), col("clean_text").as("text"))))
    }
    time("full query (composed)") {
      val bp = ext.LlmOps.boilerplateRemove(relined10(d), minDf = 3)
      val ld = ext.LlmOps.lineDedup(bp.select(col("doc_id"), col("clean_text").as("text")))
      val norm = ext.LlmOps.textNormalize(ld.select(col("doc_id"), col("clean_text").as("text")))
      val withSrc = norm.join(d.select("doc_id", "source"), "doc_id")
      noop(ext.LlmOps.packSequences(withSrc, 500, weightCol = "n_chars_norm")
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sum_chars"))
        .orderBy("source", "seq_id"))
      ext.LlmOps.releaseCaches()
    }
    time("fused bld") {
      noop(ext.LlmOps.boilerplateLineDedup(relined10(d), minDf = 3))
      ext.LlmOps.releaseCaches()
    }
    time("full query (fused)") {
      val ld = ext.LlmOps.boilerplateLineDedup(relined10(d), minDf = 3)
      val norm = ext.LlmOps.textNormalize(ld.select(col("doc_id"), col("clean_text").as("text")))
      val withSrc = norm.join(d.select("doc_id", "source"), "doc_id")
      noop(ext.LlmOps.packSequences(withSrc, 500, weightCol = "n_chars_norm")
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sum_chars"))
        .orderBy("source", "seq_id"))
      ext.LlmOps.releaseCaches()
    }
    time("dsirWeights") {
      noop(ext.LlmOps.dsirWeights(d, d.filter(col("lang") === "en")))
      ext.LlmOps.releaseCaches()
    }
    time("pmiContexts") {
      noop(ext.LlmOps.pmiContexts(d, window = 2, minCount = 2, k = 5))
      ext.LlmOps.releaseCaches()
    }
    // ---- single-shuffle prototype of boilerplate+lineDedup ----
    def singleShuffle(docs0: org.apache.spark.sql.DataFrame, minDf: Int) = {
      val lines = docs0.repartition(32)
        .select(col("doc_id").as("id"),
          posexplode(split(coalesce(col("text"), lit("")), java.util.regex.Pattern.quote("\n"))))
        .select(col("id"), col("pos"), col("col").as("line"))
        .withColumn("lh", xxhash64(col("line")))
      val perDocLh = lines.groupBy("lh", "id")
        .agg(min(struct(col("pos"), col("line"))).as("m"), count(lit(1)).as("occ"))
        .persist()
      val stats = perDocLh.groupBy("lh")
        .agg(count(lit(1)).as("df"), min(struct(col("id"), col("m"))).as("ow"))
      val docStats = perDocLh.select("lh", "id", "occ")
        .join(stats.select("lh", "df"), "lh")
        .groupBy("id").agg(
          sum(when(col("df") < minDf, col("occ")).otherwise(0L)).as("n_bp"),
          max((col("df") < minDf).cast("int")).as("has_kept"))
        .persist()
      val lhEmpty = xxhash64(lit(""))
      val phantomCand = docStats.filter(col("has_kept") === 0)
        .agg(min(col("id")).as("pid"))
        .filter(col("pid").isNotNull)
        .select(lhEmpty.as("lh"),
          struct(col("pid").as("id"),
            struct(lit(0).cast("int").as("pos"), lit("").as("line")).as("m")).as("ow"))
      val owners = stats.filter(col("df") < minDf).select("lh", "ow")
        .unionByName(phantomCand)
        .groupBy("lh").agg(min(col("ow")).as("ow"))
      val keptAgg = owners
        .select(col("ow.id").as("id"), col("ow.m.pos").as("pos"), col("ow.m.line").as("line"))
        .groupBy("id").agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"))
      docStats.join(keptAgg, Seq("id"), "left_outer")
        .select(col("id").as("doc_id"),
          when(col("has_kept") === 0, 1L).otherwise(col("n_bp")).as("n_lines"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
    }
    time("bld (single-shuffle proto)") {
      val r = singleShuffle(relined10(d), 3)
      noop(r)
      r.sparkSession.sharedState.cacheManager.clearCache()
    }
    // value parity vs the committed fused op on the full sf0.1 corpus
    locally {
      val a = singleShuffle(relined10(d), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
      val b = ext.LlmOps.boilerplateLineDedup(relined10(d), minDf = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
      println(s"PROFILE parity rows=${a.length} equal=${a.sameElements(b)}")
      ext.LlmOps.releaseCaches()
    }
    spark.stop()
  }
}
