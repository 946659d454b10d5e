package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature sketch as a native TypedImperativeAggregate — the
  * mutable-buffer aggregate mechanism Spark uses for its own sketches
  * (HLL++, percentile): one pass over the shingles computes all
  * `numPerms` permutation minima; partial buffers merge elementwise.
  *
  * vs the 32-`min()`-columns formulation: one aggregate expression, one
  * buffer allocation per group, and the signature arrives as a single
  * array column ready for band slicing.
  *
  * Permutation i is `xxhash64(shingle, seed = i)` — deterministic,
  * partition-order independent (min is commutative), engine-specific
  * (so the consuming query is a rows-only key by design).
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int = 32,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var i = 0
      while (i < numPerms) {
        val h = XxHash64Function.hash(v, child.dataType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Idempotently register as `minhash_agg(col)` on the session. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "minhash_agg")(
      exprs => MinHashAgg(exprs.head).toAggregateExpression())
}
