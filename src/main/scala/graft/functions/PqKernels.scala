package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) over `array<float>` embedding
  * columns.
  *
  * PQ splits a dim-d vector into `m` contiguous sub-vectors and encodes
  * each against its own `k`-entry codebook (k ≤ 256 → one byte per
  * subspace), compressing a 64-float embedding to `m` bytes — the scale
  * path that lets a 100 TB embedding corpus live in executor memory
  * (32× here: 256 B → 8 B). Queries score compressed codes WITHOUT
  * decompression via asymmetric distance computation (ADC): the probe
  * precomputes an m×k lookup table of exact sub-distances, and each
  * corpus row costs m table reads + adds.
  *
  * Both kernels run inside whole-stage codegen with zero per-row
  * allocation (the codebooks ride along as a reference object, the same
  * broadcast-the-small-state shape as [[KmeansKernels]]); the trainer
  * lives in [[graft.ops.Quantization]].
  */
object PqKernels {

  // case-class fields hold Seq (STRUCTURAL equality — the BpeTokens
  // rationale in BpeKernels: an Array field compares by reference, so
  // two expressions built from equal re-loaded models would never
  // semanticEquals); the runtime kernels re-materialize Arrays once per
  // expression instance via a lazy val
  private def nested(cb: Array[Array[Array[Double]]]): Seq[Seq[Seq[Double]]] =
    cb.map(_.map(_.toSeq).toSeq).toSeq

  /** Encode a vector to its `m`-byte PQ code. */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    bridge.toColumn(PqEncode(bridge.toExpression(v), nested(codebooks)))

  /** ADC approximate squared-L2 distance of a code against a probe's
    * flattened m×k LUT.
    */
  def pqAdcScore(codes: Column, lut: Column, k: Int): Column =
    bridge.toColumn(PqAdcScore(bridge.toExpression(codes), bridge.toExpression(lut), k))

  /** Training-path argmin within ONE subspace (`sub` switches codebooks). */
  def nearestSubCentroid(sub: Column, sv: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    bridge.toColumn(NearestSubCentroid(
      bridge.toExpression(sub), bridge.toExpression(sv), nested(codebooks)))

  /** Training-path min squared-L2 within one subspace (the inertia term). */
  def nearestSubDist(sub: Column, sv: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    bridge.toColumn(NearestSubDist(
      bridge.toExpression(sub), bridge.toExpression(sv), nested(codebooks)))
}

/** `array<float>` → BinaryType PQ code: byte j = argmin over codebook j
  * of squared L2 against sub-vector j (ties → lowest index — the same
  * tie-break as [[NearestCentroidIndex]], so encode and the training
  * assignment agree exactly).
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  private val m = codebooks.length
  private val subDim = codebooks.head.head.length
  require(codebooks.forall(_.forall(_.length == subDim)))
  require(codebooks.forall(_.length <= 256), "PQ codes are one byte per subspace")

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument")
    }

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], cbArr, m, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqEncode.compute($a, $cbRef, $m, $subDim);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  def compute(v: ArrayData, cb: Array[Array[Array[Double]]],
      m: Int, subDim: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    val n = v.numElements()
    var j = 0
    while (j < m) {
      val book = cb(j)
      val off = j * subDim
      // clamp to the vector's actual length: a truncated/corrupt row
      // must not read past the array (AIOOBE on GenericArrayData,
      // silent garbage bytes on UnsafeArrayData)
      val lim = math.min(subDim, n - off)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var d = 0.0
        var i = 0
        while (i < lim) {
          val diff = v.getFloat(off + i).toDouble - cen(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }
}

/** ADC score: Σ_j lut[j·k + code_j] where `lut` is the probe's flattened
  * m×k sub-distance table. The corpus-side hot loop of a PQ scan — m
  * array reads and adds per row, no vector touched.
  */
case class PqAdcScore(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary codes, array<double> lut)")
    }

  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val c = codes.asInstanceOf[Array[Byte]]
    val l = lut.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < c.length) {
      s += l.getDouble(j * k + (c(j) & 0xFF))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $j = 0; $j < $codes.length; $j++) {
         |  $s += $lut.getDouble($j * $k + ($codes[$j] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_score"
}

/** Training-path argmin: nearest codebook entry of subspace `left` for
  * the sub-vector `right` (an exploded slice). Same arithmetic and
  * tie-break as [[PqEncode]], so training assignments and final encodes
  * agree bit-for-bit.
  */
case class NearestSubCentroid(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (int subspace, array<float> sub-vector)")
    }

  override def nullSafeEval(sub: Any, sv: Any): Any =
    NearestSubCentroid.compute(
      sub.asInstanceOf[Int], sv.asInstanceOf[ArrayData], cbArr, dist = false)
      .asInstanceOf[Int]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, (sub, sv) =>
      s"${ev.value} = ((java.lang.Integer) graft.functions.NearestSubCentroid.compute(" +
        s"$sub, $sv, $cbRef, false)).intValue();")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestSubCentroid =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_sub_centroid"
}

object NearestSubCentroid {
  /** Shared scan: returns the argmin index (`dist=false`, boxed Integer)
    * or the min squared distance (`dist=true`, boxed Double).
    */
  def compute(sub: Int, sv: ArrayData, cb: Array[Array[Array[Double]]],
      dist: Boolean): AnyRef = {
    val book = cb(sub)
    val n = sv.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val cen = book(c)
      val lim = math.min(n, cen.length)
      var d = 0.0
      var i = 0
      while (i < lim) {
        val diff = sv.getFloat(i).toDouble - cen(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    if (dist) java.lang.Double.valueOf(bestD) else java.lang.Integer.valueOf(best)
  }
}

/** Min squared-L2 of an exploded sub-vector to its subspace codebook —
  * the per-row quantization-error (inertia) term during training.
  */
case class NearestSubDist(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (int subspace, array<float> sub-vector)")
    }

  override def nullSafeEval(sub: Any, sv: Any): Any =
    NearestSubCentroid.compute(
      sub.asInstanceOf[Int], sv.asInstanceOf[ArrayData], cbArr, dist = true)
      .asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, (sub, sv) =>
      s"${ev.value} = ((java.lang.Double) graft.functions.NearestSubCentroid.compute(" +
        s"$sub, $sv, $cbRef, true)).doubleValue();")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestSubDist =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_sub_dist"
}
