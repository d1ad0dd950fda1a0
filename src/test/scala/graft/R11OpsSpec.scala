package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.LlmOps
import graft.kql.{Kql, Catalog}

/** Round-11 operators: cluster-quality metrics and friends. */
class R11OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, TestSpark.sfDir)
  import spark.implicits._

  test("clusterMetrics: planted clusters give hand-computable metrics") {
    // two tight clusters far apart + one loose cluster nearby; dim=4
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, v(1.0, 0, 0, 0), 0), (2L, v(1.002, 0, 0, 0), 0),
      (3L, v(-1.0, 0, 0, 0), 1), (4L, v(-1.002, 0, 0, 0), 1),
      (5L, v(0, 1.0, 0, 0), 2), (6L, v(0, 0.8, 0, 0), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = LlmOps.clusterMetrics(rows, "label", "embedding")
      .orderBy("label").collect()
    assert(out.length == 3)
    val r0 = out(0)
    // label 0: v_m = 1000, 1002 -> mean_m = 2002 div 2 = 1001;
    // inertia = (1000-1001)^2 + (1002-1001)^2 = 2
    assert(r0.getAs[Long]("n_vecs") == 2L)
    assert(r0.getAs[Long]("inertia_m2") == 2L)
    assert(r0.getAs[Long]("mean_sq_m2") == 1L)
    // nearest centroid to label 0 (at x=1001): label 2 (at y=900):
    // sep = 1001^2 + 900^2 = 1002001 + 810000
    assert(r0.getAs[Int]("nearest_lbl") == 2)
    assert(r0.getAs[Long]("nearest_sep_m2") == 1002001L + 810000L)
    // label 2: v_m = 1000, 800 -> mean 900; inertia = 100^2*2 = 20000
    val r2 = out(2)
    assert(r2.getAs[Long]("inertia_m2") == 20000L)
    // db ratio for label 0: worst over others of (s2a+s2b)*1e6 div sep;
    // vs label 1 (mean -1001): sep = 2002^2, s2 = 1+1
    val vs1 = (2L * 1000000L) / (2002L * 2002L)
    val vs2 = ((1L + 10000L) * 1000000L) / (1002001L + 810000L)
    assert(r0.getAs[Long]("db_sq_u") == math.max(vs1, vs2))
    // the ratio is pair-symmetric: label 2's worst pair is the same
    // (0,2) pair (its (1,2) ratio is identical by construction here)
    assert(r2.getAs[Long]("db_sq_u") == vs2)
    // the tight-vs-tight PAIR ratio is far below the loose pair's
    assert(vs1 < vs2)
  }

  test("stratifiedSplit: per-stratum counts honor the floor thresholds exactly") {
    // skewed strata incl. a tiny one where hash thresholding would
    // plausibly give zero val docs — the exact split cannot
    val rows = (1L to 997L).map(i => (i, if (i <= 7) "tiny" else "big"))
      .toDF("doc_id", "lang")
    val out = LlmOps.stratifiedSplit(rows, 0.8, 0.1, "lang")
    val counts = out.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def t(n: Long, u: Long) = n * u / 1000000L
    // tiny: n=7 -> train 5, val (7*900000 div 1e6)=6-5=1, test 1
    assert(counts(("tiny", "train")) == t(7, 800000))
    assert(counts.getOrElse(("tiny", "val"), 0L) == t(7, 900000) - t(7, 800000))
    assert(counts.getOrElse(("tiny", "test"), 0L) == 7 - t(7, 900000))
    assert(counts(("big", "train")) == t(990, 800000))
    assert(counts(("big", "val")) == t(990, 900000) - t(990, 800000))
    // disjoint + total: every row assigned exactly once
    assert(out.count() == 997L &&
      out.filter(col("split").isin("train", "val", "test")).count() == 997L)
    // determinism: two runs assign identically
    val a = out.orderBy("doc_id").collect().map(_.toSeq)
    val b = LlmOps.stratifiedSplit(rows, 0.8, 0.1, "lang")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("stratifiedSplit plan: no single-partition window over data") {
    val rows = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "lang")
    val plan = LlmOps.stratifiedSplit(rows, 0.5, 0.25, "lang")
      .queryExecution.executedPlan.toString
    // the data-side window partitions by (__pid, stratum); only the
    // <= P*S stat rows may pass through a partition-less window
    assert(plan.contains("__pid"), plan.take(500))
  }

  test("cluster_metrics reachable from KQL") {
    val out = Kql.run(spark,
      "embeddings | evaluate cluster_metrics(label, embedding)", cat)
      .collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n_vecs") > 0))
  }

  test("heapsLaw: checkpoints equal the brute-force prefix vocabulary") {
    val rnd = new scala.util.Random(41)
    // growing vocabulary: doc i draws from a pool of size ~sqrt scale
    val docsL = (1L to 300L).map { i =>
      val words = Seq.fill(20)(s"w${rnd.nextInt(math.max(4, (i * 3).toInt))}")
      (i, words.mkString(" "))
    }
    val df = docsL.toDF("doc_id", "text")
    val out = LlmOps.heapsLaw(df).collect()
    // brute-force replay: docs in (knuth hash, id) order, prefix vocab
    def knuth(id: Long): Long = (id * 2654435761L) % 4294967296L
    val ordered = docsL.sortBy { case (id, _) => (knuth(id), id) }
    def vocabAt(c: Int): Long =
      ordered.take(c).flatMap(_._2.split("\\s+")).toSet.size.toLong
    out.foreach { r =>
      val c = r.getAs[Long]("checkpoint")
      assert(r.getAs[Long]("vocab") == vocabAt(c.toInt),
        s"checkpoint $c vocab mismatch")
    }
    // checkpoints are 1,2,4,...,N
    val cps = out.map(_.getAs[Long]("checkpoint")).toSeq
    assert(cps == Seq(1L, 2, 4, 8, 16, 32, 64, 128, 256, 300))
    // a growing-vocabulary corpus fits a beta well inside (0, 1)
    val beta = out.head.getAs[Long]("beta_u")
    assert(beta > 100000L && beta < 1000000L, s"beta_u $beta")
  }

  test("heaps_law reachable from KQL") {
    val out = Kql.run(spark,
      "documents | evaluate heaps_law(text, doc_id)", cat).collect()
    assert(out.length >= 5)
    val vs = out.sortBy(_.getAs[Long]("checkpoint")).map(_.getAs[Long]("vocab"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b },
      "vocab must be non-decreasing in the checkpoint")
  }

  test("series_acf matches a reference Scala implementation on random integers") {
    val rnd = new scala.util.Random(29)
    def refAcf(xs: Seq[Long], lags: Int): Seq[Long] = {
      val n = xs.length
      val mu = math.floorDiv(xs.sum, n.toLong)
      val dx = xs.map(_ - mu)
      val den = dx.map(d => d * d).sum
      (1 to math.min(lags, n - 1)).map { k =>
        val num = (0 until n - k).map(i => dx(i) * dx(i + k)).sum
        num * 1000000L / den // Scala / truncates toward zero, like div
      }
    }
    (1 to 10).foreach { _ =>
      val n = 3 + rnd.nextInt(40)
      val xs = Seq.fill(n)(rnd.nextInt(2000).toLong - 400)
      val lags = 1 + rnd.nextInt(6)
      val got = Kql.run(spark,
        s"""print a = series_acf(pack_array(${xs.mkString(", ")}), $lags)""",
        cat).head.getSeq[Long](0)
      assert(got == refAcf(xs, lags), s"xs=$xs lags=$lags")
    }
    // lag-k spike on a perfectly periodic series: the biased estimator
    // (full-den normalization) gives exactly (n-k)/n at the period —
    // here 6/9 of the matched mass, and the period lag dominates
    val per = Kql.run(spark,
      "print a = series_acf(pack_array(1, 9, 5, 1, 9, 5, 1, 9, 5), 3)", cat)
      .head.getSeq[Long](0)
    assert(per(2) == 666666L, s"period-3 acf: $per")
    assert(per(2) > per(0) && per(2) > per(1), s"period lag must spike: $per")
  }

  test("avifDims: hand-built ispe walks, version refusal, unknown brands") {
    def hexToBytes(hx: String): Array[Byte] = {
      val clean = hx.replaceAll("\\s", "")
      (0 until clean.length by 2)
        .map(i => Integer.parseInt(clean.substring(i, i + 2), 16).toByte)
        .toArray
    }
    def build(brand: String, ispeVer: String, w: Int, h: Int): String = {
      val ispe = "00000014" + "69737065" + ispeVer + "00" * 3 +
        f"$w%08X" + f"$h%08X"
      val ipco = "0000001C" + "6970636F" + ispe
      val iprp = "00000024" + "69707270" + ipco
      val meta = "00000030" + "6D657461" + "00000000" + iprp
      "00000010" + "66747970" + brand + "00000000" + meta
    }
    val rows = Seq(
      (1L, hexToBytes(build("61766973", "00", 640, 480))),  // avis
      (2L, hexToBytes(build("68656966", "00", 99, 7))),     // heif
      (3L, hexToBytes(build("61766966", "01", 10, 10))),    // ispe v1: refuse dims
      (4L, hexToBytes(build("6A756E6B", "00", 5, 5))),      // unknown brand
      (5L, hexToBytes("FFD8FFE0"))                          // not ISO-BMFF
    ).toDF("doc_id", "payload")
    val out = LlmOps.avifDims(rows, "payload").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("brand") == "avis" &&
      out(0).getAs[Int]("width") == 640 && out(0).getAs[Int]("height") == 480)
    assert(out(1).getAs[String]("brand") == "heif" &&
      out(1).getAs[Int]("width") == 99 && out(1).getAs[Int]("height") == 7)
    assert(out(2).getAs[String]("brand") == "avif" &&
      out(2).isNullAt(out(2).fieldIndex("width")),
      "non-v0 ispe must refuse dims, not misparse them")
    assert(out(3).isNullAt(out(3).fieldIndex("brand")) &&
      out(3).isNullAt(out(3).fieldIndex("width")))
    assert(out(4).isNullAt(out(4).fieldIndex("brand")))
  }

  test("avif_dims reachable from KQL") {
    val out = Kql.run(spark,
      "documents | extend payload = tostring(doc_id) " +
        "| evaluate avif_dims(payload) | where isnull(brand) | count",
      cat).head.getLong(0)
    assert(out == 500L, "text payloads must all null out")
  }

  test("series_xcorr matches a reference Scala implementation; shift peaks at the shift") {
    val rnd = new scala.util.Random(31)
    def ref(xs: Seq[Long], ys: Seq[Long], lags: Int): Seq[Long] = {
      val n = xs.length
      def ctr(a: Seq[Long]) = {
        val mu = math.floorDiv(a.sum, a.length.toLong); a.map(_ - mu)
      }
      val dx = ctr(xs); val dy = ctr(ys)
      (-lags to lags).map { k =>
        (0 until n).collect {
          case i if i + k >= 0 && i + k < n => dx(i) * dy(i + k)
        }.sum
      }
    }
    (1 to 8).foreach { _ =>
      val n = 4 + rnd.nextInt(20)
      val xs = Seq.fill(n)(rnd.nextInt(200).toLong - 50)
      val ys = Seq.fill(n)(rnd.nextInt(200).toLong - 50)
      val lags = 1 + rnd.nextInt(4)
      val got = Kql.run(spark,
        s"""print a = series_xcorr(pack_array(${xs.mkString(",")}),
                                   pack_array(${ys.mkString(",")}), $lags)""",
        cat).head.getSeq[Long](0)
      assert(got == ref(xs, ys, lags), s"xs=$xs ys=$ys lags=$lags")
    }
    // y = x shifted right by s: the covariance peaks exactly at lag +s
    val xs = Seq.fill(30)(rnd.nextInt(1000).toLong)
    val s2 = 3
    val ys = Seq.fill(s2)(0L) ++ xs.dropRight(s2)
    val got = Kql.run(spark,
      s"""print a = series_xcorr(pack_array(${xs.mkString(",")}),
                                 pack_array(${ys.mkString(",")}), 5)""",
      cat).head.getSeq[Long](0)
    assert(got.indexOf(got.max) == 5 + s2, s"peak must sit at +$s2: $got")
  }

  test("stupidBackoff: seen bigrams use c2/c1, unseen back off to the unigram") {
    // train (ids 1..4): "a b" x3 and "a c" -> c2(a,b)=3, c2(a,c)=1, c1(a)=4
    // test (id 5): "a b a x" -> (a,b) seen; (b,a) unseen, cu(a)=4;
    //              (a,x) unseen, cu(x)=0
    val rows = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "a b a x")).toDF("doc_id", "text")
    val out = LlmOps.stupidBackoff(rows, holdMod = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_bigrams") == 3L && r.getAs[Long]("n_backoff") == 2L)
    // replay: N=8 train tokens, V=3 distinct (a, b, c)
    val lnSeen = math.round(-math.log(3.0 / 4) * 1e6)
    val lnBoA = math.round(-math.log(0.4 * (4 + 1) / (8 + 3)) * 1e6)
    val lnBoX = math.round(-math.log(0.4 * (0 + 1) / (8 + 3)) * 1e6)
    val want = BigDecimal((lnSeen + lnBoA + lnBoX).toDouble / 3 / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("mean_neg_logp_sb") - want) < 1e-9,
      s"got ${r.getAs[Double]("mean_neg_logp_sb")} want $want")
  }

  test("stupid_backoff reachable from KQL") {
    val out = Kql.run(spark,
      "documents | evaluate stupid_backoff(5, text, doc_id) | count", cat)
      .head.getLong(0)
    assert(out == 100L)
  }

  test("keywordExtract: rare terms outrank common ones; ties break on term") {
    // "rare" appears only in doc 1 (high idf); "common" in all docs (idf 0)
    val rows = Seq(
      (1L, "common rare rare other"),
      (2L, "common other"),
      (3L, "common other")).toDF("doc_id", "text")
    val out = LlmOps.keywordExtract(rows, k = 2).orderBy("doc_id", "rank")
      .collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1(0).getAs[String]("term") == "rare", d1.mkString("; "))
    // idf(rare) = ln(3/1), tf 2
    assert(d1(0).getAs[Long]("score_u") ==
      2L * math.round(math.log(3.0) * 1e6))
    // doc 2: common and other both score 0 (df: common 3, other 3) ->
    // tie breaks alphabetically
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getAs[String]("term")).toSeq == Seq("common", "other"))
    // k-cut: no doc emits more than k rows
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2))
  }

  test("keyword_extract reachable from KQL") {
    val out = Kql.run(spark,
      "documents | evaluate keyword_extract(3, text, doc_id) | count", cat)
      .head.getLong(0)
    assert(out == 1500L)
  }

  test("scriptDetect: counts per script, mixed text picks the max, ties alphabetical") {
    val rows = Seq(
      (1L, "abc привет"),      // 3 latin vs 6 cyrillic
      (2L, "ab пр"),           // 2 vs 2 tie -> cyrillic (alphabetical)
      (3L, "12345 !!!"),       // no letters
      (4L, null)
    ).toDF("doc_id", "text")
    val out = LlmOps.scriptDetect(rows).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_latin") == 3L &&
      out(0).getAs[Long]("n_cyrillic") == 6L &&
      out(0).getAs[String]("dominant_script") == "cyrillic")
    assert(out(1).getAs[String]("dominant_script") == "cyrillic",
      "equal counts must tie alphabetically")
    assert(out(2).isNullAt(out(2).fieldIndex("dominant_script")) &&
      out(2).getAs[Long]("n_letters") == 0L)
    assert(out(3).getAs[Long]("n_letters") == 0L)
  }

  test("licenseDetect: SPDX wins over phrases; headers only; null when unknown") {
    val mitBody = "x" * 3000 + " Permission is hereby granted, free of charge"
    val rows = Seq(
      (1L, "// SPDX-License-Identifier: BSD-3-Clause\ncode"),
      (2L, "Mozilla Public License, v. 2.0 terms apply"),
      (3L, mitBody), // phrase past headChars: must NOT match
      (4L, "no license text at all")
    ).toDF("doc_id", "text")
    val out = LlmOps.licenseDetect(rows).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("license") == "bsd-3-clause")
    assert(out(1).getAs[String]("license") == "mpl-2.0")
    assert(out(2).isNullAt(out(2).fieldIndex("license")),
      "body mentions do not relicense the file")
    assert(out(3).isNullAt(out(3).fieldIndex("license")))
  }

  test("script/license detect reachable from KQL") {
    val a = Kql.run(spark,
      "documents | evaluate script_detect(text) " +
        "| where dominant_script == 'latin' | count", cat).head.getLong(0)
    assert(a == 500L, "fixture text is all-latin")
    val b = Kql.run(spark,
      "documents | evaluate license_detect(text) | where isnull(license) | count",
      cat).head.getLong(0)
    assert(b == 500L)
  }

  test("bucketed point lookup PRUNES buckets (SelectedBucketsCount < total)") {
    val d = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .select("doc_id", "source", "n_chars")
    graft.sources.BucketedLayout.writeBucketed(
      d, "graft_bprune_spec", Seq("doc_id"), buckets = 8)
    // autoBucketedScan un-buckets scans with no distribution requirement
    // and silently forfeits bucket PRUNING with them — pin it off for
    // the point-lookup path (the conf the layout's readers must set)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    val q = try spark.table("graft_bprune_spec")
      .filter(col("doc_id") === 7L)
    finally ()
    val plan = q.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in plan: ${plan.take(600)}")
    assert(m.get.group(1).toInt == 1 && m.get.group(2).toInt == 8,
      s"expected 1 of 8 buckets, got ${m.get.group(0)}")
    assert(q.count() == 1L)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "true")
  }

  test("pmiContexts: planted collocation tops its partners' lists") {
    // "strong tea" co-occur only with each other; filler words mix
    val rows = (1L to 40L).map { i =>
      val filler = s"w${i % 3} w${(i + 1) % 3}"
      (i, if (i % 2 == 0) s"strong tea $filler" else s"$filler strong tea")
    }.toDF("doc_id", "text")
    val out = LlmOps.pmiContexts(rows, window = 1, minCount = 2, k = 2)
      .collect()
    val teaTop = out.filter(r => r.getAs[String]("target") == "tea" &&
      r.getAs[Long]("rank") == 1L).head
    assert(teaTop.getAs[String]("context") == "strong",
      s"tea's top PMI context must be strong: $teaTop")
    val strongTop = out.filter(r => r.getAs[String]("target") == "strong" &&
      r.getAs[Long]("rank") == 1L).head
    assert(strongTop.getAs[String]("context") == "tea")
    // every emitted pair respects minCount and the k-cut
    assert(out.forall(_.getAs[Long]("c_ab") >= 2L))
    assert(out.groupBy(_.getAs[String]("target")).forall(_._2.length <= 2))
  }

  test("pmiContexts: marginal joins are NOT forced broadcasts") {
    // marg is vocabulary-sized (a row per distinct token: 1e8-1e9 at
    // web scale) — a forced broadcast() would OOM the driver where a
    // plain shuffled join is exactly as correct. The LOGICAL plan must
    // carry no broadcast hint on the marginal joins; AQE may still
    // choose a broadcast at runtime when the side is actually small
    // (that is the point). The 1-row total stays hinted.
    val rows = (1L to 40L)
      .map(i => (i, s"a b c w${i % 5}")).toDF("doc_id", "text")
    val logical = LlmOps.pmiContexts(rows, 1, 2, 2)
      .queryExecution.optimizedPlan.toString
    val hints = "(?i)broadcast".r.findAllIn(logical).length
    // exactly the crossJoin(broadcast(tot)) hint survives optimization
    assert(hints <= 1, s"marginal join carries a broadcast hint:\n$logical")
  }

  test("pmi_contexts reachable from KQL") {
    val out = Kql.run(spark,
      "documents | evaluate pmi_contexts(2, 2, 3, text)", cat).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Long]("rank") <= 3L))
  }

  test("set statements: accepted request options; a table named set still works") {
    val plain = Kql.run(spark, "orders | count", cat).head.getLong(0)
    val a = Kql.run(spark,
      "set notruncation; orders | count", cat).head.getLong(0)
    assert(a == plain)
    val b = Kql.run(spark,
      "set truncationmaxsize = 1048576; set notruncation; " +
        "let x = 1; orders | where o_orderkey >= x - 1 | count",
      cat).head.getLong(0)
    assert(b == plain)
    // a let-bound name `set` (no option shape after it) still resolves
    val c = Kql.run(spark,
      "let set = orders | project o_orderkey; set | count", cat)
      .head.getLong(0)
    assert(c == plain)
  }

  test("mv-expand multi-column: lockstep zip, null padding, itemindex") {
    val out = Kql.run(spark,
      """print k = 1
        | extend a = pack_array(10, 20, 30), b = pack_array('x', 'y')
        | mv-expand with_itemindex = ix a, b
        | project ix, a, b""", cat).collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        Option(r.get(1)).map(_.asInstanceOf[Number].longValue),
        Option(r.get(2))))
    assert(out.toSeq == Seq(
      (0L, Some(10L), Some("x")),
      (1L, Some(20L), Some("y")),
      (2L, Some(30L), None)), out.mkString("; "))
    // duplicate output names fail loudly
    val e = intercept[Exception] {
      Kql.run(spark,
        "print a = pack_array(1) | mv-expand a, a | count", cat).collect()
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("embeddingOutliers: a planted far vector flags, the tight cluster does not") {
    def v(x: Double): Array[Float] = Array(x.toFloat, 0f, 0f, 0f)
    val rows = (1L to 20L).map(i => (i, v(1.0 + 0.001 * i), 0)) :+
      ((21L, v(50.0), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = LlmOps.embeddingOutliers(df).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    assert(out(21L), "the far vector must flag")
    assert((1L to 20L).count(out(_)) == 0, "the tight cluster must not flag")
    // fixture non-vacuity: some outliers exist, most vectors pass
    val fx = LlmOps.embeddingOutliers(
      spark.read.parquet(TestSpark.sfDir + "/embeddings.parquet"))
    val nOut = fx.filter(col("is_outlier")).count()
    assert(nOut > 0 && nOut < fx.count() / 10)
  }

  test("embedding_outliers reachable from KQL") {
    val n = Kql.run(spark,
      "embeddings | evaluate embedding_outliers(label, embedding, vec_id) | count",
      cat).head.getLong(0)
    val want = spark.read.parquet(TestSpark.sfDir + "/embeddings.parquet")
      .count()
    assert(n == want, s"one verdict per vector: $n vs $want")
  }

  test("union isfuzzy=true skips unresolvable legs; false still fails loudly") {
    val plain = Kql.run(spark, "orders | count", cat).head.getLong(0)
    // source form: the bad leg drops, the good one survives
    val a = Kql.run(spark,
      "union isfuzzy=true no_such_table, orders | count", cat)
      .head.getLong(0)
    assert(a == plain)
    // op form: ALL fuzzy legs may drop -> just the piped frame
    val b = Kql.run(spark,
      "orders | union isfuzzy=true no_such_table | count", cat)
      .head.getLong(0)
    assert(b == plain)
    // nothing resolves -> loud error
    val e1 = intercept[Exception] {
      Kql.run(spark, "union isfuzzy=true nope1, nope2 | count", cat).collect()
    }
    assert(e1.getMessage.contains("no operand resolved"), e1.getMessage)
    // without isfuzzy the unresolvable leg still fails loudly
    intercept[Exception] {
      Kql.run(spark, "union no_such_table, orders | count", cat).collect()
    }
  }

  test("mergeUpsert: update wins, insert appends, tombstone deletes, rest pass") {
    import graft.ext.TableOps
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val ch = Seq((2L, "B", false), (4L, "d", false), (3L, "", true))
      .toDF("k", "v", "del")
    val out = TableOps.mergeUpsert(old, ch, Seq("k"), Some("del"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (4L, "d")))
    // without a delete column every change row applies
    val out2 = TableOps.mergeUpsert(old, Seq((3L, "C")).toDF("k", "v"),
      Seq("k")).orderBy("k").collect().map(_.getString(1))
    assert(out2.toSeq == Seq("a", "b", "C"))
  }

  test("streamEnrich row: dimension misses stay null (outer semantics on a stream)") {
    val out = graft.SparkEntry.streamEnrichQuery(spark, TestSpark.sfDir)
      .collect()
    val nulls = out.count(_.isNullAt(3))
    assert(nulls > 0 && nulls < out.length,
      s"need both matched and unmatched rows, got $nulls of ${out.length}")
  }

  test("pipeline_v4 stages are each non-vacuous on the fixture") {
    // robots gate drops some rows, URL dedup collapses some canonical
    // pairs, and scheduling spreads hosts over >1 slot — if any stage
    // were a no-op the composed row would prove less than it claims
    val d = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
    val n = d.count()
    val out = graft.SparkEntry.queries("llm_pipeline_v4")(
      spark, TestSpark.sfDir).collect()
    val kept = out.map(_.getAs[Long]("n_urls")).sum
    assert(kept < n, "robots gate + dedup must drop rows")
    // ~6/7 pass robots, canonical PAIRS (2k, 2k+1) then collapse -> ~n/2
    assert(kept > n / 4, "gates are selective, not mass-drops")
    assert(out.exists(_.getAs[Long]("max_slot") > 0),
      "scheduling must spread some host over multiple slots")
  }

  test("datasetCard: hand-computed per-source summary") {
    val rows = Seq(
      (1L, "s1", "en", "a b a"),
      (2L, "s1", "en", "a b a"),     // exact dup of doc 1
      (3L, "s1", "fr", "c d"),
      (4L, "s2", "en", "x")).toDF("doc_id", "source", "lang", "text")
    val out = LlmOps.datasetCard(rows).orderBy("source").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_tokens") == 8L)
    assert(s1.getAs[Long]("vocab") == 4L)
    assert(s1.getAs[Long]("dup_docs") == 1L)
    assert(s1.getAs[Long]("mean_tokens_u") == 8000000L / 3)
    // lang entropy: en 2/3, fr 1/3 ->
    // (2*round(ln(3/2)e6) + 1*round(ln(3)e6)) div 3
    val want = (2 * math.round(math.log(1.5) * 1e6) +
      math.round(math.log(3.0) * 1e6)) / 3
    assert(s1.getAs[Long]("lang_entropy_u") == want)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_docs") == 1L &&
      s2.getAs[Long]("lang_entropy_u") == 0L &&
      s2.getAs[Long]("dup_docs") == 0L)
  }

  test("dataset_card reachable from KQL") {
    val out = Kql.run(spark,
      "documents | evaluate dataset_card(source, lang, text, doc_id)", cat)
      .collect()
    assert(out.length >= 2 && out.forall(_.getAs[Long]("n_docs") > 0))
  }

  test("frontierSchedule: slots fill in priority order, at most perSlot per host") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 1L)).toDF("doc_id", "host", "priority")
    val out = LlmOps.frontierSchedule(rows, perSlot = 2)
      .orderBy("host", "rank_in_host").collect()
    // host a: priority desc, ties by id -> 2, 4, 3, 1
    assert(out.take(4).map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 4L, 3L, 1L))
    assert(out.take(4).map(_.getAs[Long]("fetch_slot")).toSeq ==
      Seq(0L, 0L, 1L, 1L))
    assert(out(4).getAs[Long]("doc_id") == 5L &&
      out(4).getAs[Long]("fetch_slot") == 0L)
    // per-slot cap holds per host
    val caps = out.groupBy(r => (r.getAs[String]("host"),
      r.getAs[Long]("fetch_slot"))).values.map(_.length)
    assert(caps.forall(_ <= 2))
  }

  test("frontier_schedule reachable from KQL") {
    val out = Kql.run(spark,
      "documents | extend host = strcat('h', tostring(doc_id % 10)), " +
        "priority = n_chars " +
        "| evaluate frontier_schedule(5, host, priority, doc_id) " +
        "| summarize mx = max(fetch_slot)", cat).head.getLong(0)
    assert(out == 9L, s"50 urls/host at 5 per slot -> slots 0..9, got $out")
  }

  test("hilbert index: bijective on the grid, consecutive cells always adjacent") {
    import graft.sources.HilbertLayout
    for (bits <- Seq(2, 3)) {
      val n = 1 << bits
      val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
      val df = cells.toDF("x", "y")
      val got = HilbertLayout
        .withHilbertBuckets(df, col("x"), col("y"), bits, "h")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("h"))
        .toMap
      // bijection onto 0 .. n^2-1
      assert(got.values.toSet == (0L until n.toLong * n).toSet,
        s"bits=$bits not a bijection")
      // THE Hilbert property z-order lacks: consecutive indices are
      // grid-adjacent (manhattan distance exactly 1)
      val byD = got.map(_.swap)
      (0L until n.toLong * n - 1).foreach { d =>
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits jump at d=$d: ($x1,$y1)->($x2,$y2)")
      }
    }
  }

  test("hilbert layout narrows per-file ranges on both dimensions") {
    import graft.sources.HilbertLayout
    val d = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
      .withColumn("h", pmod(pmod(col("doc_id") * 2654435761L,
        lit(4294967296L)), lit(1000L)))
      .select("doc_id", "n_chars", "h")
    val path = java.nio.file.Files
      .createTempDirectory("graft_hil").toString + "/t"
    HilbertLayout.hilbertWrite(d, path, Seq("n_chars", "h"),
      bits = 4, files = 8)
    val re = spark.read.parquet(path)
    // content identical (placement-only transform)
    assert(re.count() == d.count())
    assert(re.agg(sum("doc_id")).head.getLong(0) ==
      d.agg(sum("doc_id")).head.getLong(0))
    // per-file ranges on BOTH dims are narrower than the global range
    import org.apache.spark.sql.functions.{input_file_name, max => smax, min => smin}
    val spans = re.groupBy(input_file_name())
      .agg((smax("n_chars") - smin("n_chars")).as("s1"),
        (smax("h") - smin("h")).as("s2")).collect()
    val g1 = d.agg(smax("n_chars") - smin("n_chars")).head.getLong(0).toDouble
    val g2 = d.agg(smax("h") - smin("h")).head.getLong(0).toDouble
    val m1 = spans.map(_.getAs[Long]("s1")).sum.toDouble / spans.length
    val m2 = spans.map(_.getAs[Long]("s2")).sum.toDouble / spans.length
    assert(m1 < 0.8 * g1, s"dim1 mean span $m1 vs global $g1")
    assert(m2 < 0.8 * g2, s"dim2 mean span $m2 vs global $g2")
  }

  test("codeDetect: real code flags, prose and empty text do not") {
    val code =
      "import os\ndef main(argv):\n  x = {1: 2};\n  return x[1];\n" +
        "class Foo:\n  void = None;"
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "some more plain words follow here without any symbols at all"
    val rows = Seq((1L, code), (2L, prose), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val out = LlmOps.codeDetect(rows).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("is_code"), out(0).toString)
    assert(!out(1).getAs[Boolean]("is_code"), out(1).toString)
    assert(!out(2).getAs[Boolean]("is_code") &&
      out(2).getAs[Long]("code_score_u") == 0L)
    assert(!out(3).getAs[Boolean]("is_code"))
    // code scores dominate prose by a wide margin (routing headroom)
    assert(out(0).getAs[Long]("code_score_u") >
      10 * math.max(out(1).getAs[Long]("code_score_u"), 1L))
  }

  test("code_detect reachable from KQL") {
    val n = Kql.run(spark,
      "documents | evaluate code_detect(text) | where is_code | count",
      cat).head.getLong(0)
    assert(n == 0L, "natural-text fixture docs must not flag as code")
  }

  test("warcMeta: header-only records, folded case, missing fields, totality") {
    val rec1 = "WARC/1.1\r\nwarc-type: metadata\r\n" +
      "WARC-Target-URI: http://a/b?q=1\r\nContent-Length: 0\r\n\r\n"
    val rec2 = "WARC/1.0\r\nWARC-Type: response\r\n\r\n" + // no uri/date/len
      "HTTP/2 503 Service Unavailable\r\n" +
      "content-type:  application/json ; charset=utf-8\r\n\r\n{}"
    val rows = Seq((1L, rec1), (2L, rec2), (3L, "just words"), (4L, null))
      .toDF("doc_id", "rec")
    val out = LlmOps.warcMeta(rows, "rec").orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[String]("warc_version") == "1.1")
    assert(r1.getAs[String]("warc_type") == "metadata") // folded name
    assert(r1.getAs[String]("target_uri") == "http://a/b?q=1")
    assert(r1.getAs[Long]("content_length") == 0L)
    assert(r1.isNullAt(r1.fieldIndex("http_status"))) // no http block
    val r2 = out(1)
    assert(r2.getAs[Int]("http_status") == 503)
    assert(r2.getAs[String]("mime") == "application/json")
    assert(r2.getAs[String]("charset") == "utf-8")
    assert(r2.isNullAt(r2.fieldIndex("target_uri"))) // absent header
    assert(out(2).isNullAt(out(2).fieldIndex("warc_version")))
    assert(out(3).isNullAt(out(3).fieldIndex("warc_version"))) // null total
  }

  test("warc_meta reachable from KQL") {
    val n = Kql.run(spark,
      "documents | evaluate warc_meta(text) | where isnull(warc_version) | count",
      cat).head.getLong(0)
    assert(n == 500L)
  }

  test("stratified_split reachable from KQL") {
    val out = Kql.run(spark,
      "documents | evaluate stratified_split(0.8, 0.1, lang, doc_id)" +
        " | summarize n = count() by split", cat).collect()
    assert(out.map(_.getAs[String]("split")).toSet == Set("train", "val", "test"))
  }
}
