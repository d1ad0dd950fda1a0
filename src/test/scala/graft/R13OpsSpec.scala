package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.LlmOps
import graft.kql.Kql

/** r13 training-data ops: SFT loss-mask assembly, DPO preference
  * pairs, Matryoshka truncation audit, curriculum shards, CCNet
  * per-language LM buckets. */
class R13OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private lazy val cat = new graft.kql.Catalog(spark, TestSpark.sfDir)

  test("sftPack: loss mask covers exactly response+EOS; <2-token docs drop") {
    val df = Seq((1L, "a b c d e f"), (2L, "x"), (3L, "p q")).toDF("doc_id", "text")
    val got = LlmOps.sftPack(df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // doc 1: 6 tokens, prompt = max(1, 6*0.33) = 1 (integer 6*330000 div 1e6 = 1)
    assert(got.toSeq == Seq(
      (1L, 6L, 1L, 5L, 8L, 3L, 6L),  // total 6+2; loss starts after BOS+1
      (3L, 2L, 1L, 1L, 4L, 3L, 2L))) // the 1-token doc is gone
    // invariant: loss region ends exactly at the sequence end
    got.foreach { case (_, _, _, _, total, start, len) =>
      assert(start + len - 1 == total) }
  }

  test("dpoPairs: argmax/argmin with id tie-breaks; degenerate groups drop") {
    // group 0: TTR 1e6 for ids 30 and 60 (score tie -> chosen = smaller
    // id 30), 250000 for id 90 (rejected); group 1: single member ->
    // dropped; group 2: equal scores -> margin 0 -> dropped
    val df = Seq(
      (10L, "a b", 0), (20L, "c d", 0), (30L, "e e e e", 0),
      (11L, "x y", 1),
      (12L, "p p", 2), (22L, "q q", 2))
      .map { case (id, t, g) => (id * 3 + g, t) } // encode group via pmod 3
      .toDF("doc_id", "text")
    val got = LlmOps.dpoPairs(df, groups = 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (0L, 30L, 90L, 750000L, 3L))
  }

  test("dpoPairs: planted scores give known pair and margin") {
    // TTR scores: "a a a a" = 250000, "a b c d" = 1000000, "a a b b" = 500000
    val df = Seq((0L, "a b c d"), (50L, "a a a a"), (100L, "a a b b"))
      .toDF("doc_id", "text") // all pmod 50 == 0 -> one prompt group
    val got = LlmOps.dpoPairs(df, groups = 50).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (0L, 0L, 50L, 750000L, 3L))
  }

  test("matryoshkaEval: hand-computed prefix energies") {
    // v = (3, 4): fid(1) = 3/5 = 0.6, fid(2) = 1.0
    val df = Seq((1L, Seq(3f, 4f))).toDF("vec_id", "embedding")
    val got = LlmOps.matryoshkaEval(df, dims = Seq(1, 2))
      .orderBy("dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 600000L, 600000L),
                            (2L, 1L, 1000000L, 1000000L)))
    // a zero vector contributes nothing (guarded division)
    val z = Seq((1L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    assert(LlmOps.matryoshkaEval(z, dims = Seq(1)).count() == 0)
  }

  test("curriculumShards: rank order, contiguous shards, two-phase plan") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val q = LlmOps.curriculumShards(docs, shards = 4)
    val rows = q.collect()
    val n = rows.length
    assert(n > 0)
    // ranks are a permutation of 1..n and shards are rank-monotone
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
    val byRank = rows.sortBy(_.getLong(2))
    assert(byRank.map(_.getLong(3)).toSeq == byRank.map(_.getLong(3)).sorted.toSeq)
    // all 4 shards populated, sizes within 1 of each other
    val sizes = rows.groupBy(_.getLong(3)).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1)
    // the global rank runs two-phase: a (__pid)-keyed window must exist
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), plan.take(1500))
    // score order is respected across the shard boundary
    val s0max = rows.filter(_.getLong(3) == 0).map(_.getLong(1)).max
    val s3min = rows.filter(_.getLong(3) == 3).map(_.getLong(1)).min
    assert(s0max <= s3min)
  }

  test("ccnetBuckets: per-language terciles are balanced and score-ordered") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val rows = LlmOps.ccnetBuckets(docs).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val n = rs.length
      val head = rs.filter(_.getString(4) == "head")
      val tail = rs.filter(_.getString(4) == "tail")
      // tercile sizes: ceil/floor of n/3 by the rank arithmetic
      assert(math.abs(head.length - n / 3) <= 1, s"$lang head ${head.length}/$n")
      // every head score <= every tail score (rank-ordered cut)
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.map(_.getLong(3)).max <= tail.map(_.getLong(3)).min, lang)
    }
  }

  test("globalShuffle: permutation, round-robin shards, seed-stable") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val a = LlmOps.globalShuffle(docs, shards = 4).collect()
    val n = a.length
    // every doc appears exactly once; positions within a shard are
    // contiguous 0..size-1
    assert(a.map(_.getLong(0)).distinct.length == n)
    a.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // round-robin cut: shard sizes within 1 of each other
    val sizes = a.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1)
    // deterministic across layouts
    val b = LlmOps.globalShuffle(docs.repartition(7), shards = 4).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    // and NOT the identity order (it actually shuffles)
    val firstShardIds = a.filter(_.getLong(1) == 0).sortBy(_.getLong(2))
      .map(_.getLong(0)).toSeq
    assert(firstShardIds != firstShardIds.sorted)
  }

  test("calibrationBins: bin arithmetic and observed rates on a plant") {
    // scores: "a b" -> 1e6 (top bin 9), "a a" -> 500000 (bin 5);
    // labels: text length >= 6 chars with charCut 6
    val df = Seq((1L, "a b c"), (2L, "a a a")).toDF("doc_id", "text")
    val got = LlmOps.calibrationBins(df, bins = 10, charCut = 6)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // "a b c": TTR 1e6 -> clamped bin 9, label 0 (5 chars);
    // "a a a": TTR 333333 -> bin 3, label 0
    assert(got.toSeq == Seq((3L, 1L, 0L, 0L), (9L, 1L, 0L, 0L)))
    val got2 = LlmOps.calibrationBins(
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"),
      bins = 10, charCut = 6).collect()
    assert(got2.head.getLong(2) == 1L) // 16 chars >= 6 -> positive
    assert(got2.head.getAs[Long]("observed_u") == 1000000L)
  }

  test("rougeN: hand-computed recall on a known pair") {
    // ref = a b c d, cand = a b d: match_1 = 3, ref_1 = 4 (recall .75);
    // bigrams ref {ab, bc, cd}, cand {ab, bd} -> match_2 = 1, ref_2 = 3
    val df = Seq((1L, "a b c d", "a b d")).toDF("doc_id", "ref", "cand")
    val r = LlmOps.rougeN(df, "ref", "cand").head
    assert((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (3L, 4L, 750000L, 1L, 3L, 333333L))
  }

  test("stupidBackoffIndexed ≡ the direct path; model tables are count-sized") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val test = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    LlmOps.buildLmIndex(train, "lm_spec_idx")
    val indexed = LlmOps.stupidBackoffIndexed(spark, "lm_spec_idx", test)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = LlmOps.stupidBackoff(docs, holdMod = 5)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(indexed == direct)
    // the model is count-sized, not corpus-sized: c1 rows = distinct
    // bigram-prefix tokens; totals is exactly one row
    assert(spark.table("lm_spec_idx_tot").count() == 1)
    assert(spark.table("lm_spec_idx_c1").count() ==
      spark.table("lm_spec_idx_c2").select("prev").distinct().count())
    // rebuild is bit-identical (no seed, no sampling)
    LlmOps.buildLmIndex(train.repartition(7), "lm_spec_idx2")
    val again = LlmOps.stupidBackoffIndexed(spark, "lm_spec_idx2", test)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(again == indexed)
  }

  test("KQL reach for the batch-2 r13 plugins") {
    assert(Kql.run(spark,
      "documents | evaluate global_shuffle(8, doc_id) | summarize n = count() by shard | count",
      cat).head.getLong(0) == 8L)
    assert(Kql.run(spark,
      "documents | evaluate calibration_bins(10, 200, text, doc_id) | count",
      cat).head.getLong(0) > 0)
    assert(Kql.run(spark,
      "documents | extend r = text, c = text | evaluate rouge_n(r, c, doc_id) | where recall_1_u == 1000000 | count",
      cat).head.getLong(0) > 0)
  }

  test("KQL reach for the five r13 plugins") {
    assert(Kql.run(spark,
      "documents | evaluate sft_pack(text, doc_id) | count", cat)
      .head.getLong(0) > 0)
    assert(Kql.run(spark,
      "documents | evaluate dpo_pairs(50, text, doc_id) | count", cat)
      .head.getLong(0) > 0)
    assert(Kql.run(spark,
      "embeddings | evaluate matryoshka(embedding, vec_id) | count", cat)
      .head.getLong(0) == 4L)
    assert(Kql.run(spark,
      "documents | evaluate curriculum_shards(8, text, doc_id) | summarize n = count() by shard | count",
      cat).head.getLong(0) == 8L)
    assert(Kql.run(spark,
      "documents | evaluate ccnet_buckets(lang, text, doc_id) | where bucket == 'head' | count",
      cat).head.getLong(0) > 0)
  }
}
