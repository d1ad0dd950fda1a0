package graft.sketch

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019 — public algorithm): a bounded-size
  * mergeable percentile sketch. Centroids cluster adaptively under the
  * scale bound 4·n·q(1−q)/δ, so tail quantiles keep near-exact rank
  * resolution while the middle compresses — the property that makes it
  * the standard serving sketch for p95/p99 at warehouse scale.
  *
  * Role in this engine (the hll/hll_merge pattern for percentiles):
  * `tdigest(x)` aggregates partial sketches map-side, `tdigest_merge`
  * re-aggregates persisted sketches — a 100 TB percentile becomes one
  * narrow shuffle of ≤ δ centroids per group instead of a sort, and
  * pre-aggregated sketch cubes answer rollup percentiles without
  * touching raw data. Like every merging digest, the exact centroid
  * layout depends on merge order (partitioning) — rank error is bounded
  * (≲ 1% at δ=100) but results are not bit-stable across layouts, so
  * bench oracles use banded contracts (the dcount/hll convention) and
  * the accuracy floor is pinned in SketchSpec. */
final class TDigest(val compression: Double) extends Serializable {
  private[sketch] var means: Array[Double] = Array.emptyDoubleArray
  private[sketch] var weights: Array[Double] = Array.emptyDoubleArray
  private[sketch] var total: Double = 0.0

  // unmerged insert buffer; LAZILY allocated and grown (32 → 512) so a
  // high-cardinality group-by holding millions of live digests pays per
  // observed value, not 8 KB per empty buffer — and the kryo bytes that
  // cross partitions shrink with it. Compressed when full (amortized
  // O(δ log δ)).
  private val bufCap = 512
  private var bufM: Array[Double] = null
  private var bufW: Array[Double] = null
  private var bufN: Int = 0

  def add(x: Double, w: Double = 1.0): Unit = {
    if (bufM != null && bufN == bufM.length) {
      if (bufN >= bufCap) compress() // resets bufN and releases buffers
      else {
        bufM = java.util.Arrays.copyOf(bufM, bufM.length * 2)
        bufW = java.util.Arrays.copyOf(bufW, bufW.length * 2)
      }
    }
    if (bufM == null) {
      bufM = new Array[Double](32); bufW = new Array[Double](32)
    }
    bufM(bufN) = x; bufW(bufN) = w; bufN += 1
  }

  def mergeIn(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      add(other.means(i), other.weights(i)); i += 1
    }
  }

  /** Fold buffer + centroids into a fresh centroid list under the k1
    * scale bound. Deterministic given insertion order. */
  def compress(): Unit = {
    if (bufN == 0 && means.length <= compression * 2) return
    val n = means.length + bufN
    if (n == 0) return
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    System.arraycopy(means, 0, m, 0, means.length)
    System.arraycopy(weights, 0, w, 0, means.length)
    if (bufN > 0) {
      System.arraycopy(bufM, 0, m, means.length, bufN)
      System.arraycopy(bufW, 0, w, means.length, bufN)
    }
    bufN = 0
    // sort (mean asc) — indices sorted to keep (m, w) aligned
    val idx = (0 until n).sortBy(m(_)).toArray
    val tot = {
      var s = 0.0; var i = 0
      while (i < n) { s += w(i); i += 1 }; s
    }
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var out = 0
    var curM = m(idx(0)); var curW = w(idx(0))
    var wSoFar = 0.0
    // k1 scale function (Dunning 2019): a cluster may span at most one
    // unit of k(q) = δ/2π·asin(2q−1) — tails get near-singleton
    // resolution, the middle compresses, and the total cluster count is
    // bounded by ~δ (not δ·log n as the quadratic bound gives)
    val norm = compression / (2.0 * math.Pi)
    def kOf(q: Double): Double = norm * math.asin((2.0 * q - 1.0).max(-1.0).min(1.0))
    var i = 1
    while (i < n) {
      val cm = m(idx(i)); val cw = w(idx(i))
      val qLeft = wSoFar / tot
      val qRight = (wSoFar + curW + cw) / tot
      if (kOf(qRight) - kOf(qLeft) <= 1.0) {
        // weighted-mean merge into the open centroid
        curM = (curM * curW + cm * cw) / (curW + cw)
        curW += cw
      } else {
        om(out) = curM; ow(out) = curW; out += 1
        wSoFar += curW
        curM = cm; curW = cw
      }
      i += 1
    }
    om(out) = curM; ow(out) = curW; out += 1
    means = java.util.Arrays.copyOf(om, out)
    weights = java.util.Arrays.copyOf(ow, out)
    total = tot
    // release the insert buffer: a compressed digest serializes as just
    // its centroids (next add() re-allocates the small initial buffer)
    bufM = null; bufW = null
  }

  /** Quantile at q ∈ [0,1] by linear interpolation between centroid
    * means, treating each centroid's mass as centered on its mean
    * (standard t-digest estimation). */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q.max(0.0).min(1.0) * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val center = cum + weights(i) / 2
      if (target < center) {
        if (i == 0) return means(0)
        val prevCenter = cum - weights(i - 1) / 2
        val f = (target - prevCenter) / (center - prevCenter)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      cum += weights(i); i += 1
    }
    means(n - 1)
  }

  /** Fraction of mass ≤ x (inverse of [[quantile]], same centroid
    * interpolation). A run of centroids whose mean EQUALS x (heavy
    * duplicated values stay singletons under the k1 tail bound)
    * contributes all its mass, counted half — symmetric at both edges
    * and in the middle. */
  def cdf(x: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (x < means(0)) return 0.0
    if (x > means(n - 1)) return 1.0
    // mass strictly below x and exactly at x (centroid-mean equality)
    var below = 0.0; var at = 0.0
    var i = 0
    while (i < n) {
      if (means(i) < x) below += weights(i)
      else if (means(i) == x) at += weights(i)
      i += 1
    }
    if (at > 0.0) return (below + at / 2) / total
    // x between two adjacent distinct centroid means: interpolate
    i = 0
    var cum = 0.0
    while (i < n - 1) {
      if (x > means(i) && x < means(i + 1)) {
        val c0 = cum + weights(i) / 2
        val c1 = cum + weights(i) + weights(i + 1) / 2
        val f = (x - means(i)) / (means(i + 1) - means(i))
        return (c0 + f * (c1 - c0)) / total
      }
      cum += weights(i); i += 1
    }
    1.0
  }

  def centroidCount: Int = { compress(); means.length }

  /** Wire format: [int32 n][float64 compression][float64 total]
    * [n × float64 means][n × float64 weights]. */
  def serialize(): Array[Byte] = {
    compress()
    val n = means.length
    val bb = ByteBuffer.allocate(4 + 16 + 16 * n)
    bb.putInt(n).putDouble(compression).putDouble(total)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); i += 1 }
    i = 0
    while (i < n) { bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  val DefaultCompression = 100.0

  def deserialize(bytes: Array[Byte]): TDigest =
    tryDeserialize(bytes).getOrElse(throw new IllegalArgumentException(
      s"not a t-digest sketch (${if (bytes == null) "null" else s"${bytes.length} bytes"})"))

  /** Validated parse: the extractor functions are user-callable on ANY
    * binary column, so malformed/truncated bytes must yield None (the
    * registry's invalid-input-⇒-null convention), not a
    * BufferUnderflowException or a giant allocation from a corrupt n.
    * The length identity `len == 4 + 16 + 16·n` pins n exactly. */
  def tryDeserialize(bytes: Array[Byte]): Option[TDigest] = {
    if (bytes == null || bytes.length < 20 || (bytes.length - 20) % 16 != 0)
      return None
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0 || bytes.length != 20 + 16L * n) return None
    // bound only what breaks PARSING (NaN/non-positive/infinite headers)
    // — an upper compression limit would reject sketches this library's
    // own constructor legally produced (round-trip totality)
    val compression = bb.getDouble
    if (!(compression > 0) || compression.isInfinite) return None
    val t = new TDigest(compression)
    t.total = bb.getDouble
    if (!(t.total >= 0) || t.total.isInfinite) return None
    t.means = Array.fill(n)(bb.getDouble)
    t.weights = Array.fill(n)(bb.getDouble)
    Some(t)
  }

  /** `tdigest(x)` aggregate: values → serialized sketch. Buffers stay
    * live objects through ObjectHashAggregate (the make_bag pattern);
    * kryo only crosses partition boundaries. */
  private object BuildAgg extends Aggregator[java.lang.Double, TDigest, Array[Byte]] {
    def zero: TDigest = new TDigest(DefaultCompression)
    def reduce(b: TDigest, a: java.lang.Double): TDigest = {
      if (a != null) b.add(a.doubleValue()); b
    }
    def merge(b1: TDigest, b2: TDigest): TDigest = { b1.mergeIn(b2); b1 }
    def finish(b: TDigest): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `tdigest_merge(sketch)` aggregate: partial sketches → one sketch —
    * the re-aggregation step over persisted sketch tables. */
  private object MergeAgg extends Aggregator[Array[Byte], TDigest, Array[Byte]] {
    def zero: TDigest = new TDigest(DefaultCompression)
    def reduce(b: TDigest, a: Array[Byte]): TDigest = {
      if (a != null) b.mergeIn(deserialize(a)); b
    }
    def merge(b1: TDigest, b2: TDigest): TDigest = { b1.mergeIn(b2); b1 }
    def finish(b: TDigest): Array[Byte] = b.serialize()
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private lazy val buildUdaf = udaf(BuildAgg, Encoders.DOUBLE)
  private lazy val mergeUdaf = udaf(MergeAgg, Encoders.BINARY)

  def tdigestAgg(c: Column): Column = buildUdaf(c.cast("double"))
  def tdigestMergeAgg(c: Column): Column = mergeUdaf(c)

  // scalar extractors — deliberate UDFs (COVERAGE §2.11): the sketch is
  // an opaque binary whose walk is a data-dependent loop; no builtin or
  // higher-order-function formulation exists
  private lazy val quantileUdf = org.apache.spark.sql.functions.udf(
    (bytes: Array[Byte], pct: Double) => tryDeserialize(bytes)
      .map(t => java.lang.Double.valueOf(t.quantile(pct / 100.0))).orNull)
  private lazy val rankUdf = org.apache.spark.sql.functions.udf(
    (bytes: Array[Byte], x: Double) => tryDeserialize(bytes)
      .map(t => java.lang.Double.valueOf(t.cdf(x) * 100.0)).orNull)

  /** `percentile_tdigest(sketch, p)`: value at percentile p (0–100). */
  def percentileTDigest(sketch: Column, pct: Column): Column =
    quantileUdf(sketch, pct.cast("double"))

  /** `rank_tdigest(sketch, x)`: approximate percentile rank of x. */
  def rankTDigest(sketch: Column, x: Column): Column =
    rankUdf(sketch, x.cast("double"))
}
