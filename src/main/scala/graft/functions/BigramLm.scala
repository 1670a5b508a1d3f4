package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-bigram language-model scorer — the CCNet/KenLM-style
  * "familiar text scores high, garbage scores low" quality filter
  * (Wenzek et al., "CCNet", LREC 2020 §3.3), in exact integer
  * arithmetic so the score is bit-identical across engines.
  *
  * The alphabet is the 28-class normalized ASCII domain produced by
  * [[BigramLm.normalize]]: 'a'..'z' → 0..25, ' ' → 26, '#' (everything
  * else) → 27. The model is a 784-entry long[] of
  * floor(log2(1 + corpus_count(bigram))) weights — the integer stand-in
  * for log-probabilities (both engines compute it as
  * `length(bin(1 + c)) - 1`, no floats anywhere). A document's score
  * is Σ w(bigram) over its consecutive bigrams; the caller divides by
  * the bigram count (`div`) for the per-bigram average.
  *
  * Scale shape: training is ONE map-side-combined aggregation over
  * exploded bigrams (≤ 784 distinct keys, so partial aggregation
  * reduces each task's output to ≤ 784 rows) and the model is a
  * bounded driver artifact (6 KB); scoring is this codegen'd kernel —
  * one pass over the normalized bytes per row, an array index per
  * bigram, no shuffle, no join. The explode+join+groupBy plan survives
  * only as the DuckDB oracle.
  */
case class BigramScoreSum(child: Expression, model: Seq[Long])
  extends UnaryExpression {

  require(model.length == 28 * 28,
    s"bigram model must have 784 entries, got ${model.length}")

  // Seq field for STRUCTURAL case-class equality (the BpeTokens
  // rationale, BpeKernels.scala: an Array field compares by reference,
  // so two expressions built from equal re-loaded models would never
  // semanticEquals, defeating subexpression elimination); the runtime
  // kernel's Array is materialized once per expression instance
  @transient private lazy val modelArr: Array[Long] = model.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input (the normalized text)")
    }

  override def nullSafeEval(input: Any): Any =
    BigramLm.compute(input.asInstanceOf[UTF8String], modelArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bigramModel", modelArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramLm.compute($c, $m)")
  }

  override protected def withNewChildInternal(c: Expression): BigramScoreSum =
    copy(child = c)
  override def prettyName: String = "bigram_score_sum"
}

/** One-pass bigram histogram over the whole corpus — the training side
  * of [[BigramLm]]. Accumulates the full 784-bin count array in a fixed
  * 6 KB buffer per task (update walks the normalized bytes exactly like
  * [[BigramLm.compute]]; merge is elementwise add), so training is a
  * single scan whose shuffle carries one array per map task instead of
  * one exploded row per character of the corpus. Returns array<long>[784]
  * indexed by cls(first)*28 + cls(second).
  */
case class BigramCountsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](28 * 28)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BigramLm.countInto(v.asInstanceOf[UTF8String], buffer)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(28 * 28)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BigramCountsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BigramCountsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BigramCountsAgg =
    copy(child = c.head)
  override def prettyName: String = "bigram_counts"
}

object BigramLm {

  /** Class index of a normalized byte (see [[normalize]]): the input is
    * guaranteed single-byte ASCII, so byte iteration IS char iteration.
    */
  @inline private def cls(b: Byte): Int =
    if (b >= 'a' && b <= 'z') b - 'a' else if (b == ' ') 26 else 27

  /** Static kernel so generated code and interpreted eval share it:
    * Σ model[cls(c_i)*28 + cls(c_{i+1})] over consecutive byte pairs.
    */
  def compute(text: UTF8String, model: Array[Long]): Long = {
    val n = text.numBytes()
    if (n < 2) return 0L
    var sum = 0L
    var prev = cls(text.getByte(0))
    var i = 1
    while (i < n) {
      val cur = cls(text.getByte(i))
      sum += model(prev * 28 + cur)
      prev = cur
      i += 1
    }
    sum
  }

  /** The engine-portable normalization both the kernel input and the
    * DuckDB oracle use: lowercase, fold every whitespace char to ' ',
    * fold everything outside [a-z ] to '#'. Output is single-byte
    * ASCII by construction.
    */
  def normalize(text: Column): Column = {
    import org.apache.spark.sql.functions._
    regexp_replace(
      regexp_replace(lower(text), "[\\t\\n\\x0b\\f\\r ]", " "),
      "[^a-z ]", "#")
  }

  /** Bump `counts` by the bigram histogram of `text` (shared by
    * [[BigramCountsAgg.update]]; same traversal as [[compute]]).
    */
  def countInto(text: UTF8String, counts: Array[Long]): Unit = {
    val n = text.numBytes()
    if (n < 2) return
    var prev = cls(text.getByte(0))
    var i = 1
    while (i < n) {
      val cur = cls(text.getByte(i))
      counts(prev * 28 + cur) += 1L
      prev = cur
      i += 1
    }
  }

  /** Column wrapper: `scoreSum(model)(normalizedText)`. */
  def scoreSum(model: Array[Long])(normalizedText: Column): Column =
    bridge.toColumn(BigramScoreSum(bridge.toExpression(normalizedText), model.toSeq))

  /** Column wrapper: corpus-wide bigram histogram (one array<long>[784]). */
  def bigramCounts(normalizedText: Column): Column =
    bridge.toColumn(
      BigramCountsAgg(bridge.toExpression(normalizedText)).toAggregateExpression())
}
