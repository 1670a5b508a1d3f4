package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native kernels for trained (Lloyd's) k-means over `array<float>`
  * embedding columns — the per-row hot path of
  * [[graft.ops.Clustering.kmeans]].
  *
  * The trained-centroid argmin generalizes the IVF coarse quantizer
  * ([[VectorLsh.topCentroids]], which uses deterministic pseudo-centroids):
  * here the centroid matrix is LEARNED driver-side (k×dim doubles, tiny)
  * and baked into the expression as a reference object, so assignment runs
  * inside whole-stage codegen with zero per-row allocation — the same
  * "broadcast the small state, stream the big table" shape as every dim
  * join in this engine.
  */
object KmeansKernels {

  /** Index (0-based) of the squared-L2-nearest centroid; ties break to the
    * lowest index. Pure double arithmetic over `(double) vec[i] - c[i]`,
    * accumulated left-to-right — bit-identical to the declarative
    * `zip_with`/`aggregate` recomputation the oracle gate uses.
    */
  def nearestIndex(v: Column, centroids: Array[Array[Double]]): Column =
    bridge.toColumn(NearestCentroidIndex(bridge.toExpression(v), nested(centroids)))

  /** Squared L2 distance from `v` to `centroids(idx)`. */
  def sqDistAt(v: Column, idx: Column, centroids: Array[Array[Double]]): Column =
    bridge.toColumn(SquaredDistanceAt(
      bridge.toExpression(v), bridge.toExpression(idx), nested(centroids)))

  // Seq fields for structural case-class equality (the BpeTokens
  // rationale — an Array field compares by reference and silently
  // defeats semanticEquals/subexpression elimination); the kernels
  // re-materialize their Arrays once per expression instance
  private def nested(c: Array[Array[Double]]): Seq[Seq[Double]] =
    c.map(_.toSeq).toSeq

  /** Element-wise sum of `array<float>` vectors as `array<double>` —
    * the partial/merge/final centroid accumulator.
    */
  def vectorSum(v: Column, dim: Int): Column =
    bridge.toColumn(VectorSumAgg(bridge.toExpression(v), dim).toAggregateExpression())

  /** Indices of the `n` squared-L2-nearest TRAINED centroids, nearest
    * first (ties to the lowest index) — the multi-probe coarse-quantizer
    * routing of a trained IVF index ([[graft.ops.Similarity.ivfTopKTrained]]);
    * `topIndices(v, c, 1)(0)` ≡ [[nearestIndex]].
    */
  def topIndices(v: Column, centroids: Array[Array[Double]], n: Int): Column =
    bridge.toColumn(TopTrainedCentroids(bridge.toExpression(v), nested(centroids), n))
}

case class NearestCentroidIndex(child: Expression, centroids: Seq[Seq[Double]])
  extends UnaryExpression {

  @transient private lazy val cenArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val cents = cenArr
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cen = cents(c)
      val n = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cen(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", cenArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val cen = ctx.freshName("cen")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $cen = $cRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $a.getFloat($i) - $cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidIndex =
    copy(child = c)
  override def prettyName: String = "nearest_centroid_index"
}

/** Indices of the `n` nearest trained centroids by squared L2, nearest
  * first, ties to the lowest index. One k·dim distance scan per row plus
  * an n·k selection (n and k are both tiny — the centroid matrix is a
  * driver-trained model baked in as a reference object), all inside
  * whole-stage codegen with a single fixed-size output allocation.
  */
case class TopTrainedCentroids(
    child: Expression, centroids: Seq[Seq[Double]], n: Int)
  extends UnaryExpression {

  @transient private lazy val cenArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  require(n > 0 && n <= centroids.length,
    s"topIndices: n=$n out of range for ${centroids.length} centroids")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val cents = cenArr
    val k = cents.length
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = cents(c)
      val m = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < m) {
        val diff = v.getFloat(i).toDouble - cen(i)
        d += diff * diff
        i += 1
      }
      // NaN (corrupt vector/centroid) ranks last, never poisons the
      // comparison chain
      dist(c) = if (java.lang.Double.isNaN(d)) Double.PositiveInfinity else d
      c += 1
    }
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < n) {
      // best starts at the first untaken index, not -1: if every
      // remaining distance is NaN (a corrupt vector), the row routes to
      // the lowest untaken bucket instead of crashing — the same
      // degrade-don't-throw contract as NearestCentroidIndex's default 0
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        if (!taken(j) && (best < 0 || dist(j) < bestD)) {
          bestD = dist(j); best = j
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", cenArr, "double[][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val dist = ctx.freshName("dist"); val taken = ctx.freshName("taken")
      val out = ctx.freshName("out"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val cen = ctx.freshName("cen"); val r = ctx.freshName("r")
      val j = ctx.freshName("j"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val boxed = ctx.freshName("boxed")
      s"""
         |double[] $dist = new double[$cRef.length];
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $cen = $cRef[$c];
         |  int $m = java.lang.Math.min($a.numElements(), $cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $diff = (double) $a.getFloat($i) - $cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  $dist[$c] = Double.isNaN($d) ? Double.POSITIVE_INFINITY : $d;
         |}
         |boolean[] $taken = new boolean[$cRef.length];
         |java.lang.Integer[] $boxed = new java.lang.Integer[$n];
         |for (int $r = 0; $r < $n; $r++) {
         |  int $best = -1; double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $cRef.length; $j++) {
         |    if (!$taken[$j] && ($best < 0 || $dist[$j] < $bestD)) {
         |      $bestD = $dist[$j]; $best = $j;
         |    }
         |  }
         |  $taken[$best] = true;
         |  $boxed[$r] = $best;
         |}
         |${ev.value} = new $gad($boxed);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): TopTrainedCentroids =
    copy(child = c)
  override def prettyName: String = "top_trained_centroids"
}

/** Squared L2 distance from the vector (left) to `centroids(right)`; the
  * inertia term for an already-assigned row — one centroid visited, so
  * assignment + inertia together still cost one k·dim scan per row.
  * Out-of-range index (never produced by [[NearestCentroidIndex]])
  * evaluates to 0.0 rather than throwing.
  */
case class SquaredDistanceAt(
    left: Expression, right: Expression, centroids: Seq[Seq[Double]])
  extends BinaryExpression {

  @transient private lazy val cenArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, int) arguments")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val idx = b.asInstanceOf[Int]
    if (idx < 0 || idx >= cenArr.length) 0.0
    else {
      val cen = cenArr(idx)
      val n = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cen(i)
        d += diff * diff
        i += 1
      }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", cenArr, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val cen = ctx.freshName("cen")
      s"""
         |if ($b >= 0 && $b < $cRef.length) {
         |  double[] $cen = $cRef[$b];
         |  int $n = java.lang.Math.min($a.numElements(), $cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = (double) $a.getFloat($i) - $cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  ${ev.value} = $d;
         |} else {
         |  ${ev.value} = 0.0;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sq_dist_at"
}

/** Element-wise vector sum aggregate: `array<float>` in, `array<double>`
  * out. The centroid-update accumulator of Lloyd's iteration, mapped onto
  * Spark's partial/merge/final aggregation: each partition folds its rows
  * into one fixed `dim`-length double buffer (map-side combine), the
  * exchange then carries k × dim doubles per partition — scale-free in
  * the row count, exactly like the reference's per-thread aggregation
  * tables + barrier merge (q4112.c:225-297 maps the same way for sums).
  */
case class VectorSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // getFloat on a non-float array would silently misread the buffer, so
  // reject the wrong element width at analysis time, not execution time
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) { buffer(i) += arr.getFloat(i); i += 1 }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { buffer(i) += other(i); i += 1 }
    buffer
  }

  // clone: the returned ArrayData must not alias the (reused) agg buffer
  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(dim * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = c.head)
  override def prettyName: String = "vector_sum"
}
