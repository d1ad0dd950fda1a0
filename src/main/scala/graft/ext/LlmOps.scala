package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2.12, NORTH-STAR).
  *
  * Design constraints for 100 TB scale:
  *  - every operator is expressed as declarative DataFrame transforms —
  *    shuffle-based, no driver-side collect, no UDFs (all built-in /
  *    higher-order functions ⇒ whole-stage codegen);
  *  - candidate generation for near-dup / similarity is LSH-banded
  *    (minhash bands, random-hyperplane buckets) so the cross product is
  *    never materialized; exact verification runs only on candidates;
  *  - exact all-pairs variants exist for oracle checking at small scale
  *    and are marked as such.
  */
object LlmOps {

  /** Tokenize: lowercase whitespace split. The universal front-end of the
    * text ops. */
  def withTokens(docs: DataFrame, textCol: String = "text",
                 out: String = "toks"): DataFrame =
    docs.withColumn(out, split(lower(col(textCol)), "\\s+"))

  // ================================================================ dedup

  /** Exact dedup by normalized text: one surviving row (min id) per
    * distinct text + duplicate count. Single hash-shuffle on the text key;
    * at 100 TB swap the groupBy key for xxhash64(text) to shrink shuffle
    * payload (kept as raw text here so the DuckDB oracle can reproduce). */
  def dedupExact(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.groupBy(lower(trim(col(textCol))).as("norm_text"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"),
        xxhash64(col("norm_text")).as("text_hash"))

  /** Exact n-gram (token-set) Jaccard similarity pairs ≥ threshold,
    * blocked by `blockCol` (compare only within a block — the standard
    * way to bound the token-postings self-join, which is quadratic in
    * posting-list length). Pass blockCol=None for unblocked all-pairs
    * (oracle-scale only). The sub-quadratic scale path is
    * [[nearDupPairsMinhash]]. */
  def jaccardPairs(docs: DataFrame, threshold: Double,
                   blockCol: Option[String] = None,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val blk = blockCol.map(col).getOrElse(lit(1))
    val toks = docs
      .select(blk.as("blk"), col(idCol).as("id"), explode(array_distinct(
        split(lower(col(textCol)), "\\s+"))).as("tok"))
      .distinct()
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = toks.as("a")
      .join(toks.as("b"), col("a.blk") === col("b.blk") &&
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("i"), col("n").as("ni")), "i")
      .join(sizes.select(col("id").as("j"), col("n").as("nj")), "j")
      .withColumn("jac", col("c").cast("double") / (col("ni") + col("nj") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), round(col("jac"), 4).as("jac"))
  }

  /** MinHash + LSH banding near-duplicate candidate pairs, verified by
    * exact token-set Jaccard. The 100 TB path: signatures are computed
    * per-row (no shuffle), candidates come from a groupBy on (band,
    * bandHash) — cost proportional to colliding docs, never O(n²).
    *
    * numHashes minhash functions are simulated with xxhash64(tok, seed)
    * (one pass per seed over the token array via higher-order transform —
    * stays in codegen).
    */
  def nearDupPairsMinhash(docs: DataFrame, threshold: Double = 0.8,
                          numHashes: Int = 16, bands: Int = 4,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val toks = array_distinct(split(lower(col(textCol)), "\\s+"))
    val sig = array((0 until numHashes).map { h =>
      array_min(transform(toks, t => xxhash64(t, lit(h))))
    }: _*)
    val withToks = docs.select(col(idCol).as("id"), toks.as("toks"))
    val withSig = docs.select(col(idCol).as("id"), sig.as("sig"))

    // one row per (doc, band); bucket key = hash of the band's slice.
    // IDs ONLY through the self-join — token arrays would multiply the
    // shuffle payload by the candidate fan-out.
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)).as(Seq("band", "bucket")))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()

    // exact-Jaccard verification only on surviving candidate pairs
    candidates
      .join(withToks.select(col("id").as("i"), col("toks").as("ta")), "i")
      .join(withToks.select(col("id").as("j"), col("toks").as("tb")), "j")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("ta")) + size(col("tb")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), round(col("jac"), 4).as("jac"))
  }

  /** SimHash fingerprint (nBits-wide, default 16): per bit, majority vote
    * of xxhash64(token, bit) sign. Near-dups share fingerprints (or differ
    * in ≤ k bits — hamming-join on fingerprint chunks at scale). */
  def simHash(docs: DataFrame, nBits: Int = 16,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val bits = (0 until nBits).map { b =>
      val vote = aggregate(toks, lit(0L),
        (acc, t) => acc + when((xxhash64(t, lit(b)) % 2 + 2) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    docs.select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  // ===================================================== similarity search

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  private def normD(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Brute-force cosine top-k against the embedding of `queryId`.
    * Broadcast the 1-row query side; orderBy+limit plans
    * TakeOrderedAndProject (distributed top-k, no global sort). */
  def knnCosine(emb: DataFrame, queryId: Long, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), normD(col(vecCol)).as("q_nrm"))
    val scored = emb.crossJoin(broadcast(q))
      .select(col(idCol),
        round(dotD(col(vecCol), col("q_vec")) /
          (normD(col(vecCol)) * col("q_nrm")), 4).as("cos"))
    scored.orderBy(col("cos").desc, col(idCol).asc).limit(k)
  }

  /** ANN via random-hyperplane LSH: bucket = sign-bit signature of
    * `planes` fixed pseudo-random hyperplanes (seeded, data-independent).
    * Search only scans the query's bucket — the scale path; recall is
    * traded for the 1/2^planes candidate fraction. */
  def annCosineLsh(emb: DataFrame, queryId: Long, k: Int, planes: Int = 6,
                   dim: Int = 64, seed: Long = 42,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val hyper: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    def bucketOf(vec: Column): Column =
      (0 until planes).map { p =>
        val plane = array(hyper(p).map(lit): _*)
        when(dotD(vec, plane) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val bucketed = emb.withColumn("bucket", bucketOf(col(vecCol)))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("bucket"))
    bucketed.join(broadcast(q), "bucket")
      .select(col(idCol),
        round(dotD(col(vecCol), col("q_vec")) /
          (normD(col(vecCol)) * normD(col("q_vec"))), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** All vector pairs with cosine ≥ threshold, blocked by a grouping
    * column to bound the cross product (exact within blocks). */
  def similarityPairs(emb: DataFrame, threshold: Double,
                      blockCol: String = "label", idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    // norms once per row BEFORE the pair join — higher-order array exprs
    // are interpreted (not codegen), so per-pair recompute is 3× the work
    val withNorm = emb.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).as("v"), normD(col(vecCol)).as("nrm"))
    val a = withNorm.select(col("blk"), col("id").as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("blk"), col("id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("blk")).filter(col("i") < col("j"))
      .withColumn("cos", dotD(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("blk"), col("i"), col("j"), round(col("cos"), 4).as("cos"))
  }

  // ========================================================= text analysis

  private val stopEn = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "with", "that"),
    "es" -> Seq("el", "la", "los", "que", "con"),
    "fr" -> Seq("le", "la", "les", "que", "avec"),
    "de" -> Seq("der", "die", "das", "und", "mit"),
  )

  /** Per-document quality metrics: token count, char stats, stopword
    * ratio, punctuation ratio. Pure per-row projection — embarrassingly
    * parallel, no shuffle. */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val nToks = size(toks).cast("long")
    val stopArr = array(stopEn.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("long")
    docs.select(col(idCol), nToks.as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars_m"),
      round(length(regexp_replace(col(textCol), "[^.,;:!?]", "")).cast("double") /
        length(col(textCol)), 4).as("punct_ratio"),
      nStop.as("n_stopwords"),
      round(nStop.cast("double") / nToks, 4).as("stop_ratio"))
  }

  /** Heuristic language ID by marker-word hits (+ CJK script detection).
    * Deterministic and SQL-expressible so the oracle can replicate it. */
  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val lowered = lower(col(textCol))
    def score(lang: String): Column =
      markers(lang).map(w => regexp_count(lowered, lit("\\b" + w + "\\b")))
        .reduce(_ + _).cast("long")
    val cjk = regexp_count(col(textCol), lit("[\\x{4e00}-\\x{9fff}]")).cast("long")
    val scored = docs.select(col(idCol), col(textCol),
      score("en").as("s_en"), score("es").as("s_es"),
      score("fr").as("s_fr"), score("de").as("s_de"), cjk.as("s_zh"))
    // argmax with fixed preference order on ties
    scored.withColumn("pred_lang",
      when(col("s_zh") > col("s_en") && col("s_zh") > col("s_es") &&
           col("s_zh") > col("s_fr") && col("s_zh") > col("s_de"), "zh")
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
              col("s_en") >= col("s_de"), "en")
        .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de"), "es")
        .when(col("s_fr") >= col("s_de"), "fr")
        .otherwise("de"))
      .drop(textCol)
  }

  /** Document fingerprints: whole-text md5 + min-3-gram-shingle md5
    * (winnowing-style). md5 on both engines ⇒ oracle-comparable. */
  def fingerprint(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val shingles = transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    docs.select(col(idCol),
      md5(lower(col(textCol))).as("fp"),
      array_min(transform(shingles, s => md5(s))).as("min_shingle_fp"))
  }

  /** Corpus term frequency (top terms). One explode + one shuffle. */
  def termFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))

  /** TF-IDF per (doc, term): idf = ln(N / df). Two shuffles (per-doc tf,
    * per-term df) + a broadcast-able join on term. */
  def tfIdf(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val n = docs.select(col(idCol)).distinct().count() // scalar: corpus size
    val terms = docs.select(col(idCol).as("id"),
      explode(split(lower(col(textCol)), "\\s+")).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df_ = terms.select("id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df_, "term")
      .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 4))
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  // =========================================================== multimodal

  /** Multimodal plumbing: treat media as opaque binary + typed metadata.
    * The decode step is a deterministic STUB (no image/audio libs in this
    * container — see builder brief): it derives pseudo-features from the
    * payload hash. The Spark-side shape — schema, partitioning, batch
    * projection, no driver collect — is the real, tested part.
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_size", length(col(binCol)).cast("long"))
      .withColumn("media_hash", xxhash64(col(binCol)))

  /** STUB feature extraction: 8-dim pseudo-embedding from payload hash —
    * stands in for a real decoder (mapInPandas/ONNX in production). */
  def stubDecodeFeatures(df: DataFrame, binCol: String, dims: Int = 8): DataFrame =
    df.withColumn("media_features",
      array((0 until dims).map(d =>
        (xxhash64(col(binCol), lit(d)) % 1000).cast("double") / 1000.0): _*))
}
