package graft.sketch

import scala.collection.mutable
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra–Gries frequent-items summary (Misra & Gries 1982;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS 2012 —
  * both public algorithms): a capacity-m counter map whose estimates
  * satisfy  true − n/(m+1) ≤ est ≤ true  after any sequence of inserts
  * and merges over a stream of n items. Consequently every item with
  * true count > n/(m+1) is PRESENT in the summary — the candidate-set
  * guarantee the two-pass exact heavy-hitters operator builds on.
  *
  * Role in this engine: `groupBy(token).count` is already vocabulary-
  * sized, but at 100 TB the vocabulary itself (URLs, user ids, raw
  * n-grams) can be near-corpus-sized — the full-count shuffle IS the
  * bottleneck. This summary caps per-partition state and shuffle bytes
  * at O(m) regardless of cardinality; a second pass recounts only the
  * ≤ m candidates exactly (a broadcast-semi-join scan), making the
  * final top-k EXACT whenever the k-th true count clears the n/(m+1)
  * floor — which the caller picks m to guarantee.
  *
  * Implementation notes: decrements are batched — the buffer grows to
  * 2m, then one compaction subtracts the (m+1)-th largest count from
  * every entry and drops the non-positive ones (exactly the PODS'12
  * merge step against an empty summary), amortizing the classic
  * decrement-all to O(log m) per item. The merge of two summaries is
  * union-sum followed by the same compaction, which preserves the
  * error bound additively (n = n₁ + n₂). */
final class MisraGries(val m: Int) extends Serializable {
  require(m >= 1, "misra-gries capacity must be >= 1")
  private[sketch] val counts = mutable.HashMap.empty[String, Long]
  /** Total mass subtracted by compactions — the realized error bound
    * (≤ n/(m+1)); exposed so callers can assert the guarantee. */
  private[graft] var subtracted: Long = 0L

  def add(tok: String, w: Long = 1L): Unit = {
    counts.updateWith(tok) { c => Some(c.getOrElse(0L) + w) }
    if (counts.size > 2 * m) compact()
  }

  def mergeIn(other: MisraGries): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.updateWith(t) { c0 => Some(c0.getOrElse(0L) + c) }
    }
    subtracted += other.subtracted
    if (counts.size > m) compact()
  }

  /** Subtract the (m+1)-th largest count from all entries, drop ≤ 0:
    * at most m entries survive (only counts strictly above the pivot
    * do), and the pivot mass is charged against ≥ m+1 entries. */
  private def compact(): Unit = {
    if (counts.size <= m) return
    val vals = counts.values.toArray
    java.util.Arrays.sort(vals)
    val pivot = vals(vals.length - (m + 1)) // (m+1)-th largest
    subtracted += pivot
    counts.filterInPlace { case (_, c) => c > pivot }
    counts.mapValuesInPlace { case (_, c) => c - pivot }
  }

  /** Final summary: ≤ m (token, est) entries, est ≤ true. */
  def result(): Seq[(String, Long)] = {
    compact()
    counts.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  def serialized(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val res = result()
    out.writeInt(m); out.writeLong(subtracted); out.writeInt(res.size)
    // length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws on
    // tokens whose encoding exceeds 65535 bytes, and one pathological
    // n-gram/URL would fail the whole aggregation
    res.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }
}

object MisraGries {
  def deserialize(bytes: Array[Byte]): (Int, Long, Seq[(String, Long)]) = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val m = in.readInt(); val sub = in.readLong(); val n = in.readInt()
    val entries = (0 until n).map { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      (new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    (m, sub, entries)
  }

  /** One-column udaf: mgSketch(m)(tokenCol) → serialized summary. */
  private final class Agg(m: Int)
      extends Aggregator[String, MisraGries, Array[Byte]] {
    def zero: MisraGries = new MisraGries(m)
    def reduce(b: MisraGries, tok: String): MisraGries = {
      if (tok != null) b.add(tok); b
    }
    def merge(a: MisraGries, b: MisraGries): MisraGries = { a.mergeIn(b); a }
    def finish(b: MisraGries): Array[Byte] = b.serialized()
    def bufferEncoder: Encoder[MisraGries] = Encoders.kryo[MisraGries]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def sketch(m: Int)(tok: Column): Column =
    udaf(new Agg(m), Encoders.STRING).apply(tok)
}
