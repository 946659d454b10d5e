package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense second-moment (Gram) census of a quantized long-vector column
  * in ONE tight-loop aggregate — the r13 replacement for
  * `posexplode(flatten(transform(qv, x -> transform(qv, y -> x*y))))`
  * feeding a d²-group hash aggregate in `q_embed_pca_power`. The
  * exploded formulation materializes d² product ROWS per input row
  * (4096/row ⇒ ~41M rows at sf0.1) and pushes each through the hash
  * aggregate's per-row machinery; this aggregate runs the d² multiply-
  * adds as a primitive-array loop inside one buffer per task (the
  * MinHashAgg/TopKAgg mechanism Spark uses for its own sketches), so
  * only O(partitions · d²) longs ever leave the map side — the same
  * exchange volume as before, minus the 41M-row explode.
  *
  * BIT-COMPATIBILITY CONTRACT with the exploded census it replaces:
  *  - flatten position t of row with vector length L carries product
  *    qv[t div L] · qv[t mod L]; the census keyed cells by
  *    (t div 64, t mod 64) — a FIXED 64, whatever L — so this buffer
  *    accumulates by t directly and eval() re-derives (i, j) with the
  *    same fixed 64. Exact for every L, not just the corpus's 64.
  *  - `nn` counts every contributing row (the old count(lit(1))),
  *    `sij`/`s` sum exact longs — identical integer results.
  *  - a NULL vector contributes nothing (posexplode of null emits no
  *    rows) — skipped here the same way.
  *  - a NULL ELEMENT made the old census emit null products into
  *    sum() (ignored) while count() still ticked — instead of
  *    replicating that corner the aggregate raises `sawNull` and the
  *    caller falls back to the exploded plan, which remains the
  *    behavioral reference (never exercised by the declared corpora:
  *    embedding elements are non-null floats).
  */
case class GramAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = GramAgg.outType

  override def createAggregationBuffer(): GramAgg.Buf = new GramAgg.Buf

  override def update(buf: GramAgg.Buf, input: InternalRow): GramAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      var hasNull = false
      var k = 0
      while (k < len && !hasNull) { hasNull = arr.isNullAt(k); k += 1 }
      if (hasNull) buf.sawNull = true
      else if (len > 0) {
        buf.ensure(len)
        val vals = new Array[Long](len)
        k = 0
        while (k < len) { vals(k) = arr.getLong(k); k += 1 }
        var t = 0
        var i = 0
        while (i < len) {
          val xi = vals(i)
          var j = 0
          while (j < len) {
            buf.moments(t) += xi * vals(j)
            buf.cnts(t) += 1
            t += 1
            j += 1
          }
          i += 1
        }
        k = 0
        while (k < len) {
          buf.sums(k) += vals(k)
          buf.posCnt(k) += 1
          k += 1
        }
      }
    }
    buf
  }

  override def merge(a: GramAgg.Buf, b: GramAgg.Buf): GramAgg.Buf = {
    a.sawNull = a.sawNull || b.sawNull
    if (b.maxLen > 0) {
      a.ensure(b.maxLen)
      var t = 0
      val c = b.maxLen * b.maxLen
      while (t < c) {
        a.moments(t) += b.moments(t); a.cnts(t) += b.cnts(t); t += 1
      }
      var k = 0
      while (k < b.maxLen) {
        a.sums(k) += b.sums(k); a.posCnt(k) += b.posCnt(k); k += 1
      }
    }
    a
  }

  override def eval(buf: GramAgg.Buf): Any = {
    val cells = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val c = buf.maxLen * buf.maxLen
    var t = 0
    while (t < c) {
      if (buf.cnts(t) > 0)
        cells += InternalRow(t / 64, t % 64, buf.moments(t), buf.cnts(t))
      t += 1
    }
    val sums = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var k = 0
    while (k < buf.maxLen) {
      if (buf.posCnt(k) > 0) sums += InternalRow(k, buf.sums(k))
      k += 1
    }
    InternalRow(buf.sawNull,
      new GenericArrayData(cells.toArray[Any]),
      new GenericArrayData(sums.toArray[Any]))
  }

  override def serialize(buf: GramAgg.Buf): Array[Byte] = {
    val c = buf.maxLen * buf.maxLen
    val bb = ByteBuffer.allocate(1 + 4 + c * 16 + buf.maxLen * 16)
    bb.put(if (buf.sawNull) 1.toByte else 0.toByte)
    bb.putInt(buf.maxLen)
    var t = 0
    while (t < c) { bb.putLong(buf.moments(t)); bb.putLong(buf.cnts(t)); t += 1 }
    var k = 0
    while (k < buf.maxLen) { bb.putLong(buf.sums(k)); bb.putLong(buf.posCnt(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramAgg.Buf
    buf.sawNull = bb.get() == 1.toByte
    val len = bb.getInt
    if (len > 0) {
      buf.ensure(len)
      val c = len * len
      var t = 0
      while (t < c) { buf.moments(t) = bb.getLong; buf.cnts(t) = bb.getLong; t += 1 }
      var k = 0
      while (k < len) { buf.sums(k) = bb.getLong; buf.posCnt(k) = bb.getLong; k += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GramAgg {
  /** Mutable dense buffer; grows to the largest vector length seen so
    * short/long rows coexist exactly like the exploded census. */
  final class Buf {
    var sawNull: Boolean = false
    var maxLen: Int = 0
    var moments: Array[Long] = Array.emptyLongArray
    var cnts: Array[Long] = Array.emptyLongArray
    var sums: Array[Long] = Array.emptyLongArray
    var posCnt: Array[Long] = Array.emptyLongArray

    def ensure(len: Int): Unit = if (len > maxLen) {
      val m = new Array[Long](len * len)
      val c = new Array[Long](len * len)
      // the census's cell identity is the FLAT flatten position t
      // (eval re-derives (i,j) as (t div 64, t mod 64) exactly like
      // the exploded form) — so growth is a flat copy keeping every
      // t's totals at t, never a row-major re-layout
      if (maxLen > 0) {
        System.arraycopy(moments, 0, m, 0, maxLen * maxLen)
        System.arraycopy(cnts, 0, c, 0, maxLen * maxLen)
      }
      moments = m; cnts = c
      val s = new Array[Long](len)
      val p = new Array[Long](len)
      if (maxLen > 0) {
        System.arraycopy(sums, 0, s, 0, maxLen)
        System.arraycopy(posCnt, 0, p, 0, maxLen)
      }
      sums = s; posCnt = p
      maxLen = len
    }
  }

  val outType: StructType = StructType(Seq(
    StructField("sawNull", BooleanType, nullable = false),
    StructField("cells", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("sij", LongType, nullable = false),
      StructField("nn", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("sums", ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** Idempotently register as `gram_agg(col)` on the session. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "gram_agg")(
      exprs => GramAgg(exprs.head).toAggregateExpression())
}
