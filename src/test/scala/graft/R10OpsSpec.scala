package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{LlmOps, TableOps}
import graft.kql.{Kql, Catalog, Functions}

/** Round-10 operators: html_strip crawl extraction, Flesch/FK
  * readability, snapshot table diff, and the compaction planner. */
class R10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, TestSpark.sfDir)
  import spark.implicits._

  private def strip(s: String): String = {
    val df = Seq(Tuple1(s)).toDF("h")
    df.select(Functions.registry("html_strip")(List(col("h"))).as("x"))
      .head.getString(0)
  }

  test("html_strip: script/style content dropped, tags stripped, entities decoded") {
    assert(strip("<html><body><p>Hello <b>world</b></p></body></html>") ==
      "Hello world")
    // script/style CONTENT must vanish, not just the tags
    assert(strip("<script>var x = '<p>not text</p>';</script>after") == "after")
    assert(strip("<style>p { color: red; }</style>text") == "text")
    // case-insensitive, attributes, multiline blocks
    assert(strip("<SCRIPT type=\"a\">\nline1\nline2\n</SCRIPT>ok") == "ok")
    // comments go, including markup inside them
    assert(strip("a<!-- <p>ghost</p> -->b") == "a b")
    // entity decoding with &amp; LAST: "&amp;lt;" is the LITERAL "&lt;"
    assert(strip("x &amp; y") == "x & y")
    assert(strip("&lt;tag&gt;") == "<tag>")
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("a&nbsp;b &quot;q&quot; &#39;s&#39;") == "a b \"q\" 's'")
    // whitespace collapse + trim; non-HTML passes through (total)
    assert(strip("  plain   text\nhere  ") == "plain text here")
    assert(strip("") == "")
  }

  test("readability: hand-checked counts and integer-micro scores") {
    val df = Seq(
      (1L, "the cat sat. it ran away!"),
      (2L, "a"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = LlmOps.readability(df).orderBy("doc_id").collect()
    // doc 3 has no words -> dropped
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val r1 = out(0)
    // words: the cat sat. it ran away! -> 6; sentences: 2 runs of [.!?]
    // syllables: the=1 cat=1 sat.=1 it=1 ran=1 away!=2 (a, ay) -> 7
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 2L && r1.getLong(3) == 7L)
    val fleschU = 206835000L - (1015000L * 6) / 2 - (84600000L * 7) / 6
    val fkU = (390000L * 6) / 2 + (11800000L * 7) / 6 - 15590000L
    assert(r1.getLong(4) == fleschU, s"flesch ${r1.getLong(4)} != $fleschU")
    assert(r1.getLong(5) == fkU)
    // single consonant-free-vowel word: min-1 syllable rule
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 1L && r2.getLong(3) == 1L)
  }

  test("tableDiff: added/removed/changed/unchanged incl. null handling") {
    val old = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), None),
      (3L, Some("c"), Some(3.0)), (4L, None, Some(4.0)))
      .toDF("k", "s", "v")
    val nw = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)),
      (4L, None, Some(4.0)), (5L, Some("e"), Some(5.0)))
      .toDF("k", "s", "v")
    val m = TableOps.tableDiff(old, nw, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("tableDiff: multi-column keys and value-vs-null transitions") {
    val old = Seq[(String, Long, Option[String])](("x", 1L, Some("p")),
      ("x", 2L, None)).toDF("a", "b", "v")
    val nw = Seq[(String, Long, Option[String])](("x", 1L, None),
      ("x", 2L, None)).toDF("a", "b", "v")
    val m = TableOps.tableDiff(old, nw, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    // value -> null is CHANGED (null sentinel distinct from any value)
    assert(m == Map(("x", 1L) -> "changed", ("x", 2L) -> "unchanged"))
  }

  test("compactPlan: sorted next-fit bins match a hand replay; bins near target") {
    val files = Seq((1L, 70L), (2L, 50L), (3L, 40L), (4L, 30L), (5L, 25L),
      (6L, 50L)).toDF("fid", "sz")
    val out = TableOps.compactPlan(files, "sz", "fid", 100L)
      .orderBy("fid").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // order (sz desc, fid asc): 70,50(f2),50(f6),40,30,25 cum 70,120,170,210,240,265
    // bin = (cum - sz) div 100     :  0,  0,  1,  1,  2,  2
    assert(out == Map(1L -> 0L, 2L -> 0L, 6L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 2L))
  }

  test("compactPlan: deterministic across repartitionings") {
    val base = (1L to 500L).map(i => (i, (i * 7919) % 997 + 1))
    val a = TableOps.compactPlan(base.toDF("fid", "sz").repartition(13),
      "sz", "fid", 5000L).orderBy("fid").collect().toSeq
    val b = TableOps.compactPlan(base.toDF("fid", "sz").repartition(2),
      "sz", "fid", 5000L).orderBy("fid").collect().toSeq
    assert(a == b)
    // every bin except the last lands within max-file-size of target
    val bins = a.map(r => r.getLong(2) -> r.getLong(1))
      .groupBy(_._1).map { case (bin, xs) => bin -> xs.map(_._2).sum }
    val lastBin = bins.keys.max
    bins.filter(_._1 != lastBin).foreach { case (bin, tot) =>
      assert(tot >= 5000L - 997 && tot <= 5000L + 997, s"bin $bin = $tot")
    }
  }

  test("dedupSubstringRemove: cross-doc span cut, owner keeps, clean docs untouched") {
    val span = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq(
      (1L, s"intro $span tail1"),          // owner (min doc, pos)
      (2L, s"other $span tail2"),          // duplicate -> span removed
      (3L, "a totally distinct document"), // untouched
      (4L, span)                           // duplicate, fully covered
    ).toDF("doc_id", "text")
    val out = LlmOps.dedupSubstringRemove(df, spanLen = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == s"intro $span tail1")
    assert(out(0).getLong(3) == 0L)
    assert(out(1).getString(1) == "other tail2" && out(1).getLong(3) == 8L)
    assert(out(2).getString(1) == "a totally distinct document")
    assert(out(3).getString(1) == "" && out(3).getLong(3) == 8L)
  }

  test("dedupSubstringRemove: within-doc repetition keeps the first copy") {
    val span = (1 to 8).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, s"$span mid $span")).toDF("doc_id", "text")
    val out = LlmOps.dedupSubstringRemove(df, spanLen = 8).collect()
    assert(out.head.getString(1) == s"$span mid")
    assert(out.head.getLong(3) == 8L)
  }

  test("dedupSubstringRemove: overlapping duplicate windows merge their covered spans") {
    // doc 2 repeats a 9-token span: two overlapping 8-windows both dup,
    // covered union = 9 tokens, not 16
    val span9 = (1 to 9).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, s"$span9 end"), (2L, s"pre $span9")).toDF("doc_id", "text")
    val out = LlmOps.dedupSubstringRemove(df, spanLen = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0L)
    assert(out(1).getString(1) == "pre" && out(1).getLong(3) == 9L)
  }

  test("dedupSubstringRemove: the fixture corpus actually contains duplicate spans") {
    val out = LlmOps.dedupSubstringRemove(
      spark.read.parquet(TestSpark.sfDir + "/documents.parquet"), spanLen = 8)
    val removed = out.agg(sum("n_removed")).head.getLong(0)
    assert(removed > 0, "expected shared 8-token spans in the fixture")
  }

  test("sourceSimilarity: hand corpus with known Jaccard, bounds hold") {
    val df = Seq(
      (1L, "a b c d", "s1"), (2L, "c d e f", "s2"), (3L, "x y", "s3"),
      (4L, "a b", "s1") // dup tokens within a source count once
    ).toDF("doc_id", "text", "source")
    val out = LlmOps.sourceSimilarity(df).orderBy("src_a", "src_b").collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // s1 = {a,b,c,d}, s2 = {c,d,e,f}: inter 2, union 6 -> 333333
    assert(m(("s1", "s2")) == (4L, 4L, 2L, 333333L))
    // disjoint pairs produce no row (inverted index never joins them)
    assert(!m.contains(("s1", "s3")) && !m.contains(("s2", "s3")))
    out.foreach { r =>
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
    }
  }

  test("iqrOutliers: hand-checked nearest-rank quartiles and fences") {
    // group g: values 1..8 plus outlier 100 -> n=9, r25=ceil(2.25)=3,
    // r75=ceil(6.75)=7 -> p25=3, p75=7, iqr=4, fences [-3, 13], 1 outlier
    val df = ((1L to 8L) :+ 100L).map(v => ("g", v)).toDF("grp", "v")
    val r = TableOps.iqrOutliers(df, "v", "grp").collect().head
    assert(r.getLong(1) == 9L && r.getLong(2) == 3L && r.getLong(3) == 7L)
    assert(r.getLong(4) == -3L && r.getLong(5) == 13L && r.getLong(6) == 1L)
  }

  test("iqrOutliers: tiny group degenerates to p25 = p75, zero outliers") {
    val df = Seq(("h", 5L), ("h", 5L)).toDF("grp", "v")
    val r = TableOps.iqrOutliers(df, "v", "grp").collect().head
    assert(r.getLong(2) == 5L && r.getLong(3) == 5L && r.getLong(6) == 0L)
  }

  test("stream sessions: at least one emitted session spans the batch boundary") {
    val dir = TestSpark.sfDir
    // boundary = last batch-1 event's ts (batches split at half max id)
    val slice = spark.read.parquet(dir + "/events.parquet")
      .filter(col("event_id") <= 2000)
    val halfId = slice.agg(max("event_id")).head.getLong(0) / 2
    val boundaryTs = slice.filter(col("event_id") < halfId)
      .agg(max(unix_micros(col("ts").cast("timestamp")))).head.getLong(0)
    val sessions = SparkEntry.streamSessionQuery(spark, dir).collect()
    assert(sessions.nonEmpty)
    val spanning = sessions.count(r =>
      r.getLong(1) < boundaryTs && r.getLong(2) > boundaryTs)
    assert(spanning > 0,
      "no session spans the micro-batch boundary - the state-crossing " +
        "proof would be vacuous")
  }

  test("exifMeta: wrong magic, truncation, and unknown types null out; entry cap holds") {
    def payload(hex: String) = {
      val clean = hex.replaceAll("\\s", "")
      (0 until clean.length by 2)
        .map(i => Integer.parseInt(clean.substring(i, i + 2), 16).toByte)
        .toArray
    }
    val rows = Seq(
      // valid II, one SHORT width entry
      (1L, payload("49492A00 08000000 0100 0001 0300 01000000 2800 0000")),
      // magic 43, not 42 -> all null
      (2L, payload("49492B00 08000000 0100 0001 0300 01000000 2800 0000")),
      // truncated mid-IFD -> header parses, width value unreadable
      (3L, payload("49492A00 08000000 0100 0001 03")),
      // RATIONAL type (5) is not an inline type -> width null
      (4L, payload("49492A00 08000000 0100 0001 0500 01000000 2800 0000")),
      (5L, Array[Byte](0, 1, 2)) // junk
    ).toDF("doc_id", "payload")
    val out = LlmOps.exifMeta(rows, "payload").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "II" && out(0).getLong(2) == 40L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).getString(1) == "II" && out(2).isNullAt(2))
    assert(out(3).getString(1) == "II" && out(3).isNullAt(2))
    assert(out(4).isNullAt(1) && out(4).isNullAt(2))
  }

  test("r10 plan shapes: broadcasts where promised, bounded top-k, no cartesians") {
    val docsDf = spark.read.parquet(TestSpark.sfDir + "/documents.parquet")
    // temperature_mix: rates meet rows through a BROADCAST (no data
    // shuffle on the corpus side)
    val tm = LlmOps.temperatureMix(docsDf, 0.3, 0.5)
      .queryExecution.executedPlan.toString
    assert(tm.contains("BroadcastExchange"), tm.take(400))
    assert(!tm.contains("CartesianProduct"), tm.take(400))
    // mmr candidate scan ends in a bounded top-k, not a global sort
    val readPlan = LlmOps.readability(docsDf)
      .queryExecution.executedPlan.toString
    assert(!readPlan.contains("Exchange"), readPlan.take(400))
    // vocab_drift / unigram_segment selections are TakeOrderedAndProject
    val vd = LlmOps.vocabDrift(
        docsDf.filter(col("doc_id") % 2 === 0),
        docsDf.filter(col("doc_id") % 2 === 1), 20)
      .queryExecution.executedPlan.toString
    assert(vd.contains("TakeOrderedAndProject"), vd.take(400))
    val us = LlmOps.unigramSegment(docsDf, topK = 50)
      .queryExecution.executedPlan.toString
    assert(us.contains("TakeOrderedAndProject"), us.take(400))
    assert(us.contains("BroadcastExchange"), us.take(400))
    // per-row byte parsers stay shuffle-free
    val ex = LlmOps.exifMeta(
        docsDf.withColumn("payload", encode(col("text"), "UTF-8")), "payload")
      .queryExecution.executedPlan.toString
    assert(!ex.contains("Exchange"), ex.take(400))
  }

  test("asOfLastPriorWithin: stale matches null out, fresh ones join") {
    import graft.ext.TemporalOps
    val ev = Seq(
      (1L, 1L, 0L, "click", 7.5),
      (2L, 1L, 50L, "purchase", 1.0),   // 50us after click: fresh
      (3L, 1L, 500L, "purchase", 2.0),  // 500us after click: stale
      (4L, 2L, 10L, "purchase", 3.0)    // no prior click at all
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = TemporalOps.asOfLastPriorWithin(ev, "user_id", "ts",
        "event_id", col("event_type") === "click", col("value"), "lcv",
        tolUs = 100L)
      .filter(col("event_type") === "purchase").orderBy("event_id")
      .collect()
    assert(out(0).getDouble(5) == 7.5)
    assert(out(1).isNullAt(5) && out(2).isNullAt(5))
    // the latest marker row wins even when its value is NULL: the ts
    // and value must come from the SAME picked row (a null-valued
    // fresh quote nulls the output; it must NOT resurrect the older
    // value under the newer row's timestamp)
    val ev2 = Seq(
      (1L, 1L, 0L, "click", Some(7.5)),
      (2L, 1L, 40L, "click", None),      // fresher click, null value
      (3L, 1L, 60L, "purchase", Some(1.0))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out2 = TemporalOps.asOfLastPriorWithin(ev2, "user_id", "ts",
        "event_id", col("event_type") === "click", col("value"), "lcv",
        tolUs = 100L)
      .filter(col("event_type") === "purchase").collect()
    assert(out2(0).isNullAt(5),
      "null-valued latest marker must null the as-of value")
    // fixture non-vacuity: both matched and tolerance-dropped rows occur
    val fx = TemporalOps.asOfLastPriorWithin(
        spark.read.parquet(TestSpark.sfDir + "/events.parquet"),
        "user_id", "ts", "event_id", col("event_type") === "click",
        col("value"), "lcv", tolUs = 1800L * 1000000)
      .filter(col("event_type") === "purchase")
    val strict = graft.ext.TemporalOps.asOfLastPrior(
        spark.read.parquet(TestSpark.sfDir + "/events.parquet"),
        "user_id", "ts", "event_id", col("event_type") === "click",
        col("value"), "lcv")
      .filter(col("event_type") === "purchase")
    val nTol = fx.filter(col("lcv").isNotNull).count()
    val nAll = strict.filter(col("lcv").isNotNull).count()
    assert(nTol > 0 && nTol < nAll,
      s"tolerance must drop SOME stale matches ($nTol of $nAll)")
  }

  test("cdcChunks: an early insertion shifts only local chunks (content-defined)") {
    val rnd = new scala.util.Random(23)
    val toks = Seq.fill(300)(s"w${rnd.nextInt(40)}")
    val base = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val edited = Seq((1L, (toks.take(3) ++ Seq("INSERTED") ++ toks.drop(3))
      .mkString(" "))).toDF("doc_id", "text")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      LlmOps.cdcChunks(df, w = 4, maskBits = 4).orderBy("chunk_id")
        .collect().map(_.getString(3)).toSeq
    val hB = hashes(base); val hE = hashes(edited)
    assert(hB.length >= 5, s"need several chunks, got ${hB.length}")
    // every chunk after the edited region re-synchronizes: the suffix
    // chunk hashes are identical (fixed-size chunking would shift ALL)
    val common = hB.toSet.intersect(hE.toSet).size
    assert(common >= hB.length - 2,
      s"only $common of ${hB.length} chunks survived a 1-token edit")
    assert(hB != hE, "the edited chunk itself must change")
  }

  test("robots_allow: group fallback, longest rule, Allow beats Disallow, totality") {
    def check(agent: String, path: String): Boolean = {
      val body = "# c\nUser-agent: alpha\nUser-agent: beta\n" +
        "Disallow: /private\nAllow: /private/open\nDisallow: /Docs\n" +
        "User-agent: *\nDisallow: /tmp\nDisallow: /Admin\nDisallow:\n"
      Kql.run(spark,
        s"""print a = robots_allow("${body.replace("\n", "\\n")}",
                                   "$agent", "$path")""", cat)
        .head.getBoolean(0)
    }
    assert(!check("alpha", "/private/y"))        // group rule blocks
    assert(check("BETA", "/private/open/x"))     // longer Allow wins, UA case-insens
    assert(check("alpha", "/tmp/z"))             // other group's rule ignored
    assert(!check("gamma", "/tmp/z"))            // * fallback blocks
    assert(check("gamma", "/private/y"))         // * has no /private rule
    assert(check("alpha", "/pub"))               // no matching rule -> allow
    // REP path matching is CASE-SENSITIVE (only UA folds):
    assert(!check("alpha", "/Docs/q"))           // mixed-case rule matches same-case path
    assert(check("alpha", "/docs/q"))            // ...but NOT a lowercased path
    assert(!check("gamma", "/Admin/x"))          // * group mixed-case rule blocks
    assert(check("gamma", "/admin/x"))           // case mismatch -> no match -> allow
    // no robots / no groups at all -> allowed (total)
    val empty = Kql.run(spark,
      """print a = robots_allow("", "any", "/x")""", cat).head.getBoolean(0)
    assert(empty)
  }

  test("series_dtw matches a reference Scala DP on random integer series") {
    val rnd = new scala.util.Random(17)
    def refDtw(a: Seq[Int], b: Seq[Int]): Double = {
      val inf = Double.MaxValue
      var prev = 0.0 +: Seq.fill(b.length)(inf)
      for (av <- a) {
        val cur = scala.collection.mutable.ArrayBuffer(inf)
        for (j <- b.indices) {
          val c = math.abs(av - b(j)).toDouble
          cur += math.min(math.min(prev(j + 1), prev(j)), cur(j)) + c
        }
        prev = cur.toSeq
      }
      prev.last
    }
    for (_ <- 1 to 10) {
      val a = Seq.fill(1 + rnd.nextInt(8))(rnd.nextInt(9))
      val b = Seq.fill(1 + rnd.nextInt(8))(rnd.nextInt(9))
      val got = Kql.run(spark,
        s"""print d = series_dtw(pack_array(${a.mkString(",")}),
                                 pack_array(${b.mkString(",")}))""", cat)
        .head.getDouble(0)
      assert(got == refDtw(a, b), s"a=$a b=$b: $got != ${refDtw(a, b)}")
    }
    // empty side -> null (no alignment exists)
    val r = Kql.run(spark,
      "print d = series_dtw(pack_array(1), array_slice(pack_array(1), 2, 1))",
      cat).head
    assert(r.isNullAt(0))
  }

  test("audioDhash: gain-invariant, short payloads null, pairs machinery reusable") {
    val rnd = new scala.util.Random(53)
    val env = Array.fill(65)(rnd.nextInt(180))
    def pay(f: Int => Int): Array[Byte] =
      (0 until 65).map(i => (f(i) & 0xff).toByte).toArray
    val rows = Seq(
      (1L, pay(env(_))),
      (2L, pay(i => env(i) + 60)),  // uniform gain shift
      (3L, Array[Byte](9))          // short
    ).toDF("doc_id", "payload")
    val h = LlmOps.audioDhash(rows, "payload").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(h(1L).isDefined && h(1L) == h(2L),
      "a uniform gain shift must not change a gradient-sign fingerprint")
    assert(h(3L).isEmpty)
    // the pigeonhole pair engine is hash-generic: reuse it on audio
    val pairs = LlmOps.imageNearDupPairs(
      LlmOps.audioDhash(rows, "payload"), maxHamming = 3).collect()
    assert(pairs.length == 1 && pairs.head.getLong(2) == 0L)
  }

  test("imageDhash: brightness-invariant, one-pixel edits flip at most 2 bits") {
    val rnd = new scala.util.Random(31)
    def bmp(px: (Int, Int) => Int): Array[Byte] =
      (for (r <- 0 until 8; c <- 0 until 9)
        yield (px(r, c) & 0xff).toByte).toArray
    val base = Array.fill(8, 9)(rnd.nextInt(200))
    val rows = Seq(
      (1L, bmp((r, c) => base(r)(c))),
      (2L, bmp((r, c) => base(r)(c) + 40)),               // brightness shift
      (3L, bmp((r, c) => if (r == 4 && c == 4) base(r)(c) + 90
                         else base(r)(c))),               // one-pixel edit
      (4L, Array[Byte](1, 2, 3))                          // short payload
    ).toDF("doc_id", "payload")
    val h = LlmOps.imageDhash(rows, "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(h(1L).isDefined && h(1L) == h(2L),
      "uniform brightness shift must not change a gradient-sign hash")
    val d = java.lang.Long.bitCount(h(1L).get ^ h(3L).get)
    assert(d >= 1 && d <= 2, s"one pixel touches 2 gradients, flipped $d")
    assert(h(4L).isEmpty)
  }

  test("imageNearDupPairs: pigeonhole candidates are LOSSLESS to hamming 3") {
    val rnd = new scala.util.Random(41)
    val hashes = (1L to 300L).map { i =>
      // clustered hashes: groups of 10 share a base with few bit flips
      val base = rnd.nextLong() // advances deterministically per i
      (i, if (i % 10 == 0) base else base ^ (1L << rnd.nextInt(64)))
    }.toDF("doc_id", "dhash")
    val got = LlmOps.imageNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("image_dhash/image_neardup reachable from KQL") {
    val r = Kql.run(spark,
      """documents
        | extend payload = tostring(doc_id)
        | evaluate image_dhash(payload)
        | count""", cat).collect()
    assert(r.head.getLong(0) == 500L) // short payloads -> null hashes, rows kept
  }

  test("kmvDistinct: merge of shard sketches equals sketch of the union") {
    // 3 shards with overlapping vocabularies; the merged (__all__) row
    // must equal a direct sketch over the union -> mergeability is an
    // identity, not an approximation
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3).flatMap { shard =>
      (1 to 400).map { _ =>
        (shard.toLong, s"s$shard", s"tok${rnd.nextInt(3000)}")
      }
    }.map { case (id, src, toks) => (id, src, toks) }
    val df = rows.toDF("doc_id", "source", "text")
    val out = LlmOps.kmvDistinct(df, k = 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val direct = LlmOps.kmvDistinct(
      df.withColumn("source", lit("whole")), k = 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("__all__") == direct("whole"))
  }

  test("kmvDistinct: saturated estimate within KMV error; undersized is exact") {
    val vocab = 8000
    val df = (1 to vocab).map(i => (i.toLong, "big", s"w$i")).toDF(
      "doc_id", "source", "text")
    val est = LlmOps.kmvDistinct(df, k = 256).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // (k-1)/kth estimator: sigma = true/sqrt(k) ~ 500; allow 4 sigma
    assert(math.abs(est("big") - vocab) < 2000, s"est ${est("big")}")
    val small = Seq((1L, "tiny", "a b c a")).toDF("doc_id", "source", "text")
    val e2 = LlmOps.kmvDistinct(small, k = 256).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(e2("tiny") == 3L) // below k -> exact count, not an estimate
    val kq = Kql.run(spark,
      "documents | evaluate kmv_distinct(64, source, text) | count", cat)
      .head.getLong(0)
    assert(kq == 21L)
  }

  test("RocksDB state store: session windows equal the default provider's") {
    // the disk-backed state path (state larger than executor memory at
    // 100 TB): same query, same results, different state backend
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val viaRocks =
      try SparkEntry.streamSessionQuery(spark, TestSpark.sfDir).collect().toSeq
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    val viaDefault =
      SparkEntry.streamSessionQuery(spark, TestSpark.sfDir).collect().toSeq
    assert(viaRocks.nonEmpty && viaRocks == viaDefault)
  }

  test("stream left-outer join: unmatched clicks emit null-extended rows") {
    val out = SparkEntry.streamStreamLeftJoinQuery(spark, TestSpark.sfDir)
      .collect()
    val nulls = out.count(_.isNullAt(1))
    val matched = out.count(!_.isNullAt(1))
    assert(nulls > 0, "no unmatched clicks - left-outer semantics vacuous")
    assert(matched > 0, "no matched pairs - join condition vacuous")
  }

  test("database()/cluster() qualifiers parse and resolve; unknown db fails loudly") {
    val db = new java.io.File(TestSpark.sfDir).getName
    val n = Kql.run(spark, s"database('$db').orders | count", cat)
      .head.getLong(0)
    val n2 = Kql.run(spark,
      s"cluster('local').database('$db').orders | count", cat)
      .head.getLong(0)
    val plain = Kql.run(spark, "orders | count", cat).head.getLong(0)
    assert(n == plain && n2 == plain)
    val err = intercept[Exception] {
      Kql.run(spark, "database('no_such_db').orders | count", cat).collect()
    }
    assert(err.getMessage.contains("unknown database"), err.getMessage)
    // path-traversal db names must fail loudly, never resolve a
    // sibling directory outside the fixture (they ARE directories,
    // which is exactly why the name filter has to reject them)
    Seq("..", "../sf0.001", "a/b", "./x").foreach { evil =>
      val e2 = intercept[Exception] {
        Kql.run(spark, s"database('$evil').orders | count", cat).collect()
      }
      assert(e2.getMessage.contains("unknown database"),
        s"'$evil' -> ${e2.getMessage}")
    }
    // a let-bound name `database` (no following paren) still resolves
    val viaLet = Kql.run(spark,
      "let database = orders | project o_orderkey; database | count", cat)
      .head.getLong(0)
    assert(viaLet == plain)
  }

  test("oggMeta: variable segment table honored, non-zero version nulls") {
    def payload(hex: String) = {
      val clean = hex.replaceAll("\\s", "")
      (0 until clean.length by 2)
        .map(i => Integer.parseInt(clean.substring(i, i + 2), 16).toByte)
        .toArray
    }
    val page = "4F676753 00 02 0000000000000000 AABBCCDD 00000000 11223344"
    val rows = Seq(
      // 2 segment-table bytes -> OpusHead at 27+2; ch=3 skip=312 rate=48000
      (1L, payload(page + " 02 1313 4F70757348656164 01 03 3801 80BB0000 0000 00")),
      // version byte 1 (not an Ogg v0 page) -> null
      (2L, payload("4F676753 01 02 0000000000000000 AABBCCDD 00000000 11223344 01 13" +
        " 4F70757348656164 01 03 3801 80BB0000 0000 00")),
      // unknown first packet -> codec null
      (3L, payload(page + " 01 13 DEADBEEF00000000"))
    ).toDF("doc_id", "payload")
    val out = LlmOps.oggMeta(rows, "payload").orderBy("doc_id").collect()
    assert(out(0).getString(1) == "opus" && out(0).getLong(2) == 3L &&
      out(0).getLong(3) == 312L && out(0).getLong(4) == 48000L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("temperatureMix: tail sources upsampled, rates match the integer replay") {
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("doc_id", "text2")
      .withColumnRenamed("text2", "source")
    val kept = LlmOps.temperatureMix(df, alpha = 0.3, targetFrac = 0.5)
    val rates = kept.select("source", "n_s", "w_u", "rate_u").distinct()
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // integer replay of the rate formula
    def wU(n: Long) = math.round(math.exp(0.3 * math.log(n.toDouble)) * 1e6)
    val (wb, ws) = (wU(900), wU(100))
    val wTot = wb + ws; val nTarget = 500L
    def rate(w: Long, n: Long) =
      math.min(1000000L, (w * 1000000L) / wTot * nTarget / n)
    assert(rates("big") == (900L, wb, rate(wb, 900)))
    assert(rates("small") == (100L, ws, rate(ws, 100)))
    // α = 0.3 must give the small source a strictly higher keep rate
    assert(rates("small")._3 > rates("big")._3)
    // the realized kept fraction per source is within hash noise of rate
    val keptBySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(keptBySrc("big") - 900.0 * rates("big")._3 / 1e6) < 90)
    assert(math.abs(keptBySrc("small") - 100.0 * rates("small")._3 / 1e6) < 30)
  }

  test("vocabDrift: new-only tokens drift up, old-only down, shared ~0") {
    val old = Seq((1L, "alpha alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "alpha alpha beta"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    val out = LlmOps.vocabDrift(old, nw, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("delta")._1 == 0L && out("delta")._2 == 1L &&
      out("delta")._3 > 0L)
    assert(out("gamma")._1 == 1L && out("gamma")._2 == 0L &&
      out("gamma")._3 < 0L)
    // identical counts and totals -> drift exactly 0
    assert(out("alpha")._3 == 0L && out("beta")._3 == 0L)
  }

  test("stream sliding windows: every event lands in exactly two windows") {
    val dir = TestSpark.sfDir
    val nEvents = spark.read.parquet(dir + "/events.parquet")
      .filter(col("event_id") <= 2000).count()
    val windows = SparkEntry.streamSlidingQuery(spark, dir).collect()
    assert(windows.map(_.getLong(1)).sum == 2 * nEvents)
  }

  test("readability/table_diff/compact_plan reachable from KQL; html_strip in exprs") {
    val vd = Kql.run(spark,
      "documents | where doc_id % 2 == 0 | evaluate vocab_drift(documents, 5, text)",
      cat).collect()
    assert(vd.length == 5)
    val ss = Kql.run(spark,
      "documents | evaluate source_similarity(text, source) | take 3",
      cat).collect()
    assert(ss.length == 3)
    val iq = Kql.run(spark,
      """lineitem
        | extend cents = tolong(round(l_extendedprice * 100))
        | evaluate iqr_outliers(cents, l_returnflag)""", cat).collect()
    assert(iq.length == 3)
    val ds = Kql.run(spark,
      "documents | evaluate dedup_substring(8, text, doc_id) | take 5",
      cat).collect()
    assert(ds.length == 5)
    val rd = Kql.run(spark,
      "documents | evaluate readability(text, doc_id) | take 5", cat).collect()
    assert(rd.length == 5)
    val td = Kql.run(spark,
      "orders | evaluate table_diff(orders, o_orderkey) | summarize n = count() by status",
      cat).collect()
    assert(td.length == 1 && td.head.getString(0) == "unchanged")
    val cp = Kql.run(spark,
      """lineitem
        | summarize sz = sum(tolong(l_quantity)) by fid = l_orderkey % 100
        | evaluate compact_plan(500, sz, fid)
        | summarize n_bins = dcount(bin)""", cat).collect()
    assert(cp.head.getLong(0) >= 2L)
    val hs = Kql.run(spark,
      """print x = html_strip("<p>a &amp; b</p>")""", cat).collect()
    assert(hs.head.getString(0) == "a & b")
  }
}
