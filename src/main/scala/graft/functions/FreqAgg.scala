package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) sketch as a native
  * TypedImperativeAggregate: Misra–Gries with k counters, merged via
  * the Agarwal et al. mergeable-summaries rule (sum counters, then
  * subtract the (k+1)-th largest count and drop non-positives).
  *
  * Guarantees (the textbook ones, asserted in the suite):
  *  - estimates never overcount: est ≤ true count;
  *  - undercount is bounded: true − est ≤ n/(k+1) over n total rows,
  *    and the bound survives arbitrary merge trees (map-side partials
  *    combine freely);
  *  - therefore every item with true count > n/(k+1) is present.
  *
  * Exactness corner that makes the DECLARED query oracle-verifiable:
  * when each partial sees ≤ k distinct items no decrement ever fires,
  * merges are plain counter sums, and the sketch IS the exact group
  * count — deterministic and hash-matchable against `GROUP BY`. The
  * lossy regime (distinct ≫ k) is covered by property tests instead,
  * since there the retained counter values depend on merge order (the
  * bound holds; the exact values need not be stable).
  *
  * Scale: the whole point — a full `GROUP BY token` over a 100 TB
  * token stream shuffles every distinct token; this shuffles k
  * (item, count) pairs per partial, constant per partition, and the
  * answer to "what are the heavy types?" never needs the full
  * cardinality materialized.
  */
case class FreqAgg(
    item: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqAgg.Buffer] {

  require(k > 0, s"freq_agg k must be positive, got $k")
  require(item.dataType == StringType,
    s"freq_agg needs a string item, got ${item.dataType} — " +
      "register() casts for you")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): FreqAgg.Buffer =
    new FreqAgg.Buffer(k)

  override def update(buf: FreqAgg.Buffer, input: InternalRow): FreqAgg.Buffer = {
    val v = item.eval(input)
    // UTF8String from an unsafe row may alias reused memory — copy to
    // an owned JVM string before it outlives this row
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: FreqAgg.Buffer, b: FreqAgg.Buffer): FreqAgg.Buffer = {
    a.absorb(b)
    a
  }

  override def eval(buf: FreqAgg.Buffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })

  override def serialize(buf: FreqAgg.Buffer): Array[Byte] = {
    val entries = buf.sortedDesc
    val payload = entries.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + payload.map(p => 4 + p._1.length + 8).sum)
    bb.putInt(payload.length)
    payload.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqAgg.Buffer(k)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.seed(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object FreqAgg {

  /** At most k counters. Offer is classic Misra–Gries (hit: +1; room:
    * insert; full: decrement everything, evict zeros). Absorb is the
    * mergeable-summaries rule. */
  final class Buffer(k: Int) {
    private val counts = new java.util.HashMap[String, Long]()

    def offer(item: String): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) {
        counts.put(item, cur + 1L)
      } else if (counts.size < k) {
        counts.put(item, 1L)
      } else {
        // decrement-all: every counter pays 1, zeros evicted — the
        // step that charges the undercount bound n/(k+1)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }

    /** Pre-counted entry (deserialization only — trusts the source). */
    def seed(item: String, c: Long): Unit = counts.put(item, c)

    /** Merge `other` in: sum counters; if over k, subtract the
      * (k+1)-th largest count from every counter and drop ≤ 0 (at
      * most k counts can exceed the (k+1)-th largest). */
    def absorb(other: Buffer): Unit = {
      other.counts.forEach { (item, c) =>
        counts.merge(item, c, (a: Long, b: Long) => a + b)
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        counts.forEach { (_, c) => vals(i) = c; i += 1 }
        java.util.Arrays.sort(vals)
        val sub = vals(vals.length - k - 1)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= sub) it.remove()
          else e.setValue(e.getValue - sub)
        }
      }
    }

    def size: Int = counts.size

    def estimate(item: String): Option[Long] =
      Option(counts.get(item)).filter(_ => counts.containsKey(item))

    /** Entries in output order: est DESC, item ASC (total, so the
      * exact-regime result is hash-stable). */
    def sortedDesc: Array[(String, Long)] = {
      val arr = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (s, c) => arr(i) = (s, c); i += 1 }
      arr.sortWith { case ((sa, ca), (sb, cb)) =>
        ca > cb || (ca == cb && sa < sb)
      }
    }
  }

  /** Builder shared by per-session registration and GraftExtensions:
    * `freq_agg(item, k)` with a foldable integer k. */
  def fromExpressions(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2 && exprs(1).foldable,
      "usage: freq_agg(item, k) with literal k")
    val kv = exprs(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => sys.error(s"freq_agg k must be integral, got $other")
    }
    FreqAgg(Cast(exprs(0), StringType), kv).toAggregateExpression()
  }

  /** Idempotently register as `freq_agg(item, k)`. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "freq_agg")(fromExpressions)
}
