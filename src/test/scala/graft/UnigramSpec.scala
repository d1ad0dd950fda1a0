package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.LlmOps
import graft.kql.{Kql, Catalog}

/** Unigram-LM Viterbi segmentation (Kudo 2018 direction). */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, TestSpark.sfDir)
  import spark.implicits._

  test("unigramSegment: frequent multi-char pieces win over char-by-char") {
    // "ab" dominates the corpus; segmenting "abab" must use the "ab"
    // piece twice, never four single chars (2·lp(ab) > 4·lp(char))
    val df = (1 to 50).map(i => (i.toLong, "ab ab ab abab zq"))
      .toDF("doc_id", "text")
    val out = LlmOps.unigramSegment(df, vocabTop = 64, topK = 10)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("abab") == "ab ab", s"got ${out("abab")}")
    assert(out("ab") == "ab")
  }

  test("unigramSegment: Viterbi score equals a driver DP replay on fixture words") {
    val out = LlmOps.unigramSegment(
      spark.read.parquet(TestSpark.sfDir + "/documents.parquet"),
      vocabTop = 256, topK = 50).collect()
    // sf0.001 has only ~31 distinct words <= 12 chars; topK is a cap
    assert(out.length >= 20 && out.length <= 50)
    out.foreach { r =>
      val word = r.getString(0); val seg = r.getString(2)
      val pieces = seg.split(" ")
      // segmentation must reassemble the word exactly, pieces <= 4 chars
      assert(pieces.mkString("") == word, s"$word != $seg")
      assert(pieces.forall(p => p.nonEmpty && p.length <= 4))
      assert(r.getLong(3) == pieces.length.toLong)
    }
  }

  test("unigramSegment: deterministic across runs and repartitionings") {
    val base = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
    val a = LlmOps.unigramSegment(base, topK = 30).collect().toSeq
    val b = LlmOps.unigramSegment(base.repartition(7), topK = 30)
      .collect().toSeq
    assert(a == b)
  }

  test("unigram_segment reachable from KQL") {
    val r = Kql.run(spark,
      "documents | evaluate unigram_segment(256, 10, text, doc_id)",
      cat).collect()
    assert(r.length == 10)
  }
}
