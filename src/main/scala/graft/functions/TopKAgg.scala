package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k per group as a native TypedImperativeAggregate — the
  * scale-correct alternative to the `row_number` window for per-group
  * top-k: the window formulation SORTS every group's full row set
  * (O(n log n) per group, full rows through the sort), while this
  * aggregate keeps a k-element bounded heap per group, combines
  * map-side (partial heaps merge), and moves only k (score, id) pairs
  * per group across the shuffle. At 100 TB with millions of rows per
  * hot group, that is the difference between shuffling the corpus and
  * shuffling k·groups pairs.
  *
  * Ordering is total and deterministic: (score DESC, id ASC) — ties on
  * score keep the smaller id, exactly `row_number() OVER (ORDER BY
  * score DESC, id)` semantics, so a SQL oracle can hash-match the
  * exploded result. Null scores are skipped (window rank over a
  * DESC NULLS LAST ordering never ranks them into the top k either
  * unless the group runs out of non-null rows — callers filter nulls).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0, s"topk_agg k must be positive, got $k")
  require(score.dataType == DoubleType && id.dataType == LongType,
    s"topk_agg needs (double, long) inputs, got " +
      s"(${score.dataType}, ${id.dataType}) — register() casts for you")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buffer, b: TopKAgg.Buffer): TopKAgg.Buffer = {
    b.foreach(a.offer)
    a
  }

  override def eval(buf: TopKAgg.Buffer): Any =
    new GenericArrayData(
      buf.sortedDesc.map { case (s, i) => InternalRow(s, i) })

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val pairs = buf.sortedDesc
    val bb = ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buffer(k)
    (0 until n).foreach(_ => buf.offer(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** (score DESC, id ASC)-best pair A beats B? Total order via
    * Double.compare — NaN ranks greatest (as in Spark's ORDER BY
    * DESC, where NaN sorts above every value), and -0.0 is
    * normalized to 0.0 first (Double.compare would otherwise split
    * the tie Spark's NormalizeFloatingNumbers collapses). A plain
    * `>` / `==` here is not total under NaN: every comparison
    * answers false, the heap rejects genuine candidates, and the
    * result becomes merge-order dependent. */
  private def beats(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val a = if (sa == 0.0) 0.0 else sa
    val b = if (sb == 0.0) 0.0 else sb
    val c = java.lang.Double.compare(a, b)
    c > 0 || (c == 0 && ia < ib)
  }

  /** Bounded "keep the k best" buffer: a binary min-heap ordered
    * worst-first, so the root is the candidate to evict. O(log k) per
    * offer once full; offers that don't beat the current worst are
    * O(1). Plain arrays — no boxing on the hot update path. */
  final class Buffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (beats(s, i, scores(0), ids(0))) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    /** worst-first comparison for the heap: a is "smaller" (closer to
      * eviction) than b when b beats a */
    private def worse(a: Int, b: Int): Boolean =
      beats(scores(b), ids(b), scores(a), ids(a))

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(i, (i - 1) / 2)) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < n && worse(l, m)) m = l
        if (r < n && worse(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      (0 until n).foreach(j => f(scores(j), ids(j)))

    /** Kept pairs in output order: score DESC, id ASC. */
    def sortedDesc: Array[(Double, Long)] =
      (0 until n).map(j => (scores(j), ids(j))).toArray
        .sortWith { case ((sa, ia), (sb, ib)) => beats(sa, ia, sb, ib) }
  }

  /** Builder shared by per-session registration and GraftExtensions:
    * `topk_agg(score, id, k)` with a foldable integer k; coerces
    * int/float/decimal score and int id columns up front (Cast is a
    * no-op when the type already matches). */
  def fromExpressions(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3 && exprs(2).foldable,
      "usage: topk_agg(score, id, k) with literal k")
    val kv = exprs(2).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => sys.error(s"topk_agg k must be integral, got $other")
    }
    TopKAgg(Cast(exprs(0), DoubleType), Cast(exprs(1), LongType), kv)
      .toAggregateExpression()
  }

  /** Idempotently register as `topk_agg(score, id, k)`. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "topk_agg")(fromExpressions)
}
