package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{LlmOps, SkewOps}
import graft.sketch.MisraGries
import graft.kql.{Kql, Catalog}

/** Round-9 operators: Misra-Gries heavy hitters (sketch bound + exact
  * two-pass), collocations, canonical-URL dedup, naive-Bayes langid,
  * salted joins, and the profile plugin. */
class R9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, TestSpark.sfDir)
  import spark.implicits._

  /** Zipf-ish skewed stream with vocabulary far above the sketch
    * capacity, so compaction actually runs. Deterministic (seed 42). */
  private def zipfStream(n: Int, vocab: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    // rank r gets weight ~ 1/(r+1): draw via u^2-style skew
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      val r = math.min(vocab - 1, (u * u * vocab).toInt)
      s"tok$r"
    }
  }

  test("misra-gries: est <= true, error <= n/(m+1), heavy items present") {
    val n = 50000; val vocab = 3000; val m = 64
    val stream = zipfStream(n, vocab)
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val mg = new MisraGries(m)
    stream.foreach(mg.add(_))
    val est = mg.result().toMap
    val bound = n.toDouble / (m + 1)
    assert(mg.subtracted <= bound, s"subtracted ${mg.subtracted} > $bound")
    est.foreach { case (t, e) =>
      val tr = truth(t)
      assert(e <= tr, s"$t overestimated: $e > $tr")
      assert(tr - e <= bound, s"$t error ${tr - e} > $bound")
    }
    truth.filter(_._2 > bound).keys.foreach { t =>
      assert(est.contains(t), s"heavy item $t (count ${truth(t)}) missing")
    }
  }

  test("misra-gries: serialization round-trips tokens beyond writeUTF's 64 KiB limit") {
    // raw n-grams/URLs are the stated use case — one pathological long
    // token must degrade to a correct round-trip, not throw
    val big = "x" * 70000 // > 65535 UTF-8 bytes: writeUTF would throw
    val uni = "é中" * 100 // multi-byte UTF-8 sanity
    val mg = new MisraGries(8)
    (1 to 5).foreach(_ => mg.add(big))
    (1 to 3).foreach(_ => mg.add(uni))
    mg.add("small")
    val (m, sub, entries) = MisraGries.deserialize(mg.serialized())
    assert(m == 8 && sub == 0)
    val got = entries.toMap
    assert(got(big) == 5L && got(uni) == 3L && got("small") == 1L)
  }

  test("misra-gries: merge of partial summaries keeps the additive bound") {
    val n = 40000; val vocab = 2000; val m = 48
    val stream = zipfStream(n, vocab)
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // split into 8 arbitrary partitions, summarize each, merge pairwise
    val parts = stream.grouped(n / 8 + 1).toSeq.map { chunk =>
      val s = new MisraGries(m); chunk.foreach(s.add(_)); s
    }
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    val est = merged.result().toMap
    val bound = n.toDouble / (m + 1)
    est.foreach { case (t, e) =>
      assert(e <= truth(t) && truth(t) - e <= bound,
        s"$t est $e vs true ${truth(t)}, bound $bound")
    }
    truth.filter(_._2 > bound).keys.foreach(t => assert(est.contains(t)))
  }

  test("heavyHitters: two-pass result is EXACTLY the true top-k (vocab >> m)") {
    val docsDf = zipfStream(30000, 500).grouped(50).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val got = LlmOps.heavyHitters(docsDf, m = 128, k = 15).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = docsDf.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(15).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("collocations: known corpus ranks the exclusive pair first") {
    // "aa bb" always together (lift = N-ish), "cc" frequent alone
    val rows = (0 until 40).map(i => (i.toLong,
      if (i % 2 == 0) "aa bb cc cc cc dd" else "aa bb dd cc ee cc"))
    val out = LlmOps.collocations(rows.toDF("doc_id", "text"),
      minCount = 5, k = 3).collect()
    assert(out.head.getString(0) == "aa" && out.head.getString(1) == "bb")
    // lift_u for (aa,bb): c_xy=40, c_x=40, c_y=40 -> 40*1e12/1600
    assert(out.head.getAs[Long]("lift_u") == 40L * 1000000000000L / 1600L)
  }

  test("dedupByCanonicalUrl: folds scheme/port/params, keeps max quality, tie min id") {
    val rows = Seq(
      (1L, "HTTPS://A.com:443/p?utm_source=x", 10L),
      (2L, "https://a.com/p?fbclid=y", 30L),
      (3L, "https://a.com/p", 30L), // ties doc 2 on quality -> min id wins
      (4L, "https://b.com/q?z=1&a=2", 5L),
      (5L, "https://b.com/q?a=2&z=1", 7L)) // same params, different order
      .toDF("doc_id", "url", "n_chars")
    val out = LlmOps.dedupByCanonicalUrl(rows, "url", "n_chars")
      .orderBy("canonical_url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "https://a.com/p" &&
      out(0).getLong(1) == 2L && out(0).getLong(3) == 3L)
    assert(out(1).getString(0) == "https://b.com/q?a=2&z=1" &&
      out(1).getLong(1) == 5L && out(1).getLong(3) == 2L)
  }

  test("naiveBayesLangId: recovers separable classes; deterministic") {
    // class-exclusive vocabularies => NB must classify held-out docs
    // perfectly; doc_id % 5 == 0 is the scored fold
    val rows = (0 until 50).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text = if (lang == "aa") "x x y z x" else "p q p r q"
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = LlmOps.naiveBayesLangId(rows, holdMod = 5).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)}: pred ${r.getString(2)} != ${r.getString(1)}")
    }
    val again = LlmOps.naiveBayesLangId(rows, holdMod = 5).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("saltedJoin: parity with the plain join (inner + left_outer), plan replicates the dim") {
    val rnd = new scala.util.Random(7)
    // heavy skew: 80% of left rows share key 1
    val left = (0 until 5000).map { i =>
      val k = if (rnd.nextDouble() < 0.8) 1L else rnd.nextInt(50).toLong
      (k, i.toLong)
    }.toDF("k", "v")
    val right = (0 until 40).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    for (kind <- Seq("inner", "left_outer")) {
      val got = SkewOps.saltedJoin(left, right, "k", salts = 8, joinType = kind)
        .groupBy("k").agg(count(lit(1)).as("n"), min("name").as("mn"))
        .orderBy("k").collect()
      val want = left.join(right, Seq("k"), kind)
        .groupBy("k").agg(count(lit(1)).as("n"), min("name").as("mn"))
        .orderBy("k").collect()
      assert(got.toSeq == want.toSeq, s"parity broke for $kind")
    }
    val plan = SkewOps.saltedJoin(left, right, "k", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), "expected the explode-replicated dim side")
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(left, right, "k", joinType = "right_outer")
    }
  }

  test("profile plugin matches a hand aggregate incl. nulls") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (3L, Some("a")))
      .toDF("id", "s")
    val c2 = new Catalog(spark, TestSpark.sfDir, Map("__prof_t" -> df))
    val out = Kql.run(spark, "__prof_t | evaluate profile(id, s) | sort by column asc",
      c2).collect()
    val byCol = out.map(r => r.getString(0) -> r).toMap
    val idR = byCol("id"); val sR = byCol("s")
    assert(idR.getLong(1) == 4 && idR.getLong(2) == 0 && idR.getLong(3) == 3)
    assert(idR.getString(4) == "1" && idR.getString(5) == "3")
    assert(sR.getLong(1) == 4 && sR.getLong(2) == 1 && sR.getLong(3) == 2)
    assert(sR.getString(4) == "a" && sR.getString(5) == "b")
  }

  test("series_iir matches a reference Scala fold on random dyadic inputs") {
    val rnd = new scala.util.Random(11)
    // dyadic inputs/coefs (multiples of 1/8) keep every fold state
    // exactly representable, so Spark and the reference fold must agree
    // BIT-exactly, not approximately
    def dy() = rnd.nextInt(33).toDouble / 8.0 - 2.0
    for (_ <- 1 to 10) {
      val n = 1 + rnd.nextInt(12)
      val xs = Seq.fill(n)(dy())
      val b = Seq.fill(1 + rnd.nextInt(3))(dy())
      val a = 1.0 +: Seq.fill(rnd.nextInt(2))(dy()) // a0 = 1
      def ref: Seq[Double] = {
        val ys = scala.collection.mutable.ArrayBuffer.empty[Double]
        for (i <- 1 to n) {
          val bs = b.indices.map(k =>
            if (i - k >= 1) b(k) * xs(i - k - 1) else 0.0).sum
          val as = (1 until a.length).map(k =>
            if (i - k >= 1) a(k) * ys(i - k - 1) else 0.0).sum
          ys += (bs - as) / a.head
        }
        ys.toSeq
      }
      val got = Kql.run(spark,
        s"""print y = series_iir(pack_array(${xs.mkString(", ")}),
                                pack_array(${b.mkString(", ")}),
                                pack_array(${a.mkString(", ")}))""", cat)
        .head.getSeq[Double](0)
      assert(got == ref, s"xs=$xs b=$b a=$a: $got != $ref")
    }
  }

  test("mmrSelect: first pick is max relevance; later picks trade rel for diversity") {
    val out = LlmOps.mmrSelect(
      spark.read.parquet(TestSpark.sfDir + "/embeddings.parquet"),
      queryId = 0, nCand = 16, k = 6).orderBy("step").collect()
    assert(out.length == 6)
    assert(out.map(_.getLong(1)).distinct.length == 6, "picks must be distinct")
    // step 1 has the globally max rel_u among picks, and mmr_u decreases:
    // each greedy round's objective can only shrink (smaller candidate
    // pool, larger selected set)
    assert(out.head.getLong(2) == out.map(_.getLong(2)).max)
    val mmrs = out.map(_.getLong(3)).toSeq
    assert(mmrs == mmrs.sorted.reverse, s"mmr not non-increasing: $mmrs")
  }

  test("docEntropy: hand-checked values, single-type doc has zero entropy") {
    val df = Seq((1L, "a a a a"), (2L, "a b a b"), (3L, "w x y z"))
      .toDF("doc_id", "text")
    val out = LlmOps.docEntropy(df).orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0L) // ln(1) = 0
    // doc 2: two types, each c=2, n=4: micro = round(ln(2)*1e6) = 693147
    assert(out(1).getLong(3) == 4L * 693147L)
    // doc 3: four types c=1, n=4: micro = round(ln(4)*1e6) = 1386294
    assert(out(2).getLong(3) == 4L * 1386294L)
    assert(out(2).getDouble(4) == 1.0 && out(0).getDouble(4) == 0.25)
  }

  test("doc_entropy/mmr_select reachable from KQL") {
    val de = Kql.run(spark,
      "documents | evaluate doc_entropy(text, doc_id) | take 5", cat).collect()
    assert(de.length == 5)
    val mm = Kql.run(spark,
      "embeddings | evaluate mmr_select(0, 16, 4)", cat).collect()
    assert(mm.length == 4)
  }

  test("heavy_hitters/collocations/naive_bayes/dedup_url reachable from KQL") {
    val hh = Kql.run(spark,
      "documents | evaluate heavy_hitters(256, 5, text)", cat).collect()
    assert(hh.length == 5 && hh.head.getLong(1) >= hh.last.getLong(1))
    val co = Kql.run(spark,
      "documents | evaluate collocations(5, 5, text)", cat).collect()
    assert(co.length == 5)
    val nb = Kql.run(spark,
      "documents | evaluate naive_bayes_lang(5)", cat).collect()
    assert(nb.nonEmpty)
    val du = Kql.run(spark,
      """documents | extend url = strcat('https://h.io/p', tostring(doc_id % 5))
        | evaluate dedup_url(url, n_chars, doc_id)""", cat).collect()
    assert(du.length == 5)
  }
}
