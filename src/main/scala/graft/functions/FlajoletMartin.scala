package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Flajolet–Martin / PCSA distinct-count estimator — a faithful Spark-native
  * port of the reference's cardinality estimation pass (`_estimate`,
  * /root/reference/q4112.c:105-117, merge+eval q4112.c:336-377):
  *
  *  - `2^logPartitions` bitmaps (stochastic averaging; reference uses
  *    log_partitions = 12, q4112.c:481);
  *  - per value: 64-bit hash; low bits select the partition, and the
  *    lowest set bit of the remaining bits is OR-ed into the bitmap
  *    (`bitmaps[p] |= h & -h`, q4112.c:113-116);
  *  - merge = bitwise OR across partial bitmap sets (q4112.c:343-349);
  *  - estimate = Σ_p 2^(trailing zeros of ~bitmap[p]) / PHI with
  *    PHI = 0.77351 (q4112.c:351-354, constant at q4112.c:23), rounded
  *    **up** to a power of two (q4112.c:356-371) — the reference uses the
  *    round-up to size its aggregation hash table.
  *
  * Maps 1:1 onto Spark's partial/merge/final aggregation: the per-thread
  * bitmap sets + barrier OR-merge of the reference become
  * `update`/`merge`/`eval` of a [[TypedImperativeAggregate]], so the
  * estimator runs distributed with a fixed 16 KiB buffer per partition —
  * constant memory regardless of input scale.
  *
  * `approx_count_distinct` (HLL++) remains the pragmatic default; this
  * operator exists for semantic parity with the reference and for callers
  * that want FM's round-up-to-power-of-two sizing semantics.
  */
case class FlajoletMartin(
    child: Expression,
    logPartitions: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val partitions = 1 << logPartitions
  private val PHI = 0.77351 // q4112.c:23

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](partitions)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hashAny(v)
      val p = (h & (partitions - 1)).toInt
      val rest = h >>> logPartitions
      // lowest set bit of the remaining hash bits (q4112.c:113-116);
      // rest == 0 (prob 2^-52) contributes nothing, like an all-zero draw
      buffer(p) |= (rest & -rest).toInt
    }
    buffer
  }

  private def hashAny(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    case s: org.apache.spark.unsafe.types.UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
    case b: Array[Byte] =>
      // content hash: Array[Byte].hashCode() is identity-based, so the
      // fallback below would count every ROW as distinct for BinaryType
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
    case other => XXH64.hashLong(other.hashCode().toLong, 42L)
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < partitions) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    // Σ_p 2^(trailing zeros of first unset bit) (q4112.c:351-354)
    var sum = 0.0
    var p = 0
    while (p < partitions) {
      sum += (1L << java.lang.Integer.numberOfTrailingZeros(~buffer(p))).toDouble
      p += 1
    }
    val estimate = sum / PHI
    // round up to a power of two (q4112.c:356-371)
    var result = 1L
    while (result < estimate && result < (1L << 62)) result <<= 1
    result
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(partitions * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(partitions)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): FlajoletMartin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FlajoletMartin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FlajoletMartin =
    copy(child = c.head)
  override def prettyName: String = "fm_count_distinct"
}

object FlajoletMartin {
  /** Column-API entry: FM/PCSA distinct-count estimate of `col`. */
  def fmCountDistinct(col: Column, logPartitions: Int = 12): Column =
    bridge.toColumn(
      FlajoletMartin(bridge.toExpression(col), logPartitions).toAggregateExpression())
}
