package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native LSH / coarse-quantizer kernels over `array<float>` embeddings.
  *
  * The declarative forms (per-plane / per-centroid `aggregate(zip_with(
  * xxhash64...))` columns) run as interpreted higher-order functions and
  * re-hash every (plane, dim) pair per row; these kernels derive the same
  * kind of deterministic pseudo-random projections from a splitmix64 mix
  * and fold them in one tight loop (O(planes·dim) flops, codegen'd).
  * Pseudo-random projections stand in for trained hyperplanes/centroids,
  * which would arrive as broadcast arrays in a production pipeline — the
  * plumbing downstream is identical.
  */
object VectorLsh {
  @inline def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane component p,d ∈ {-1.0, +1.0}. */
  @inline def planeComponent(p: Int, d: Int): Double =
    if ((mix((p.toLong << 32) | (d.toLong & 0xFFFFFFFFL)) & 1L) == 0L) -1.0 else 1.0

  /** Pseudo-centroid component c,d ∈ [-1.0, 1.0]. */
  @inline def centroidComponent(c: Int, d: Int): Double = {
    val m = mix((c.toLong << 32) | (d.toLong & 0xFFFFFFFFL))
    (java.lang.Math.floorMod(m, 2000001L) - 1000000L) / 1000000.0
  }

  def hyperplaneSignature(v: ArrayData, planes: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += v.getFloat(d) * planeComponent(p, d); d += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Bucket ids of the `k` highest-dot pseudo-centroids, best first. */
  def topCentroids(v: ArrayData, nCentroids: Int, k: Int): GenericArrayData = {
    val dim = v.numElements()
    val scores = new Array[Double](nCentroids)
    var c = 0
    while (c < nCentroids) {
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += v.getFloat(d) * centroidComponent(c, d); d += 1 }
      scores(c) = dot
      c += 1
    }
    val kk = math.min(k, nCentroids)
    val picked = new Array[Int](kk)
    val used = new Array[Boolean](nCentroids)
    var r = 0
    while (r < kk) {
      // best falls back to the first unused index when every remaining
      // score is NaN (a corrupt vector makes every dot NaN, and NaN
      // fails all > comparisons) — degrade-don't-throw, the same
      // contract as TopTrainedCentroids in KmeansKernels
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < nCentroids) {
        if (!used(i) && (best < 0 || scores(i) > bestScore)) {
          best = i; bestScore = scores(i)
        }
        i += 1
      }
      used(best) = true
      picked(r) = best
      r += 1
    }
    new GenericArrayData(picked.map(_.toLong))
  }
}

abstract class VectorUnaryExpression extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>")
    }
}

/** hyperplane_sig(v): `planes` sign bits of deterministic ±1 projections. */
case class HyperplaneSignature(child: Expression, planes: Int)
  extends VectorUnaryExpression {
  require(planes >= 1 && planes <= 64)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    VectorLsh.hyperplaneSignature(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorLsh.hyperplaneSignature($a, $planes)")

  override protected def withNewChildInternal(c: Expression): HyperplaneSignature =
    copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}

/** top_centroids(v): ids of the k nearest (by dot) pseudo-centroids. */
case class TopCentroids(child: Expression, nCentroids: Int, k: Int)
  extends VectorUnaryExpression {
  require(nCentroids >= 1 && k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorLsh.topCentroids(input.asInstanceOf[ArrayData], nCentroids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorLsh.topCentroids($a, $nCentroids, $k)")

  override protected def withNewChildInternal(c: Expression): TopCentroids =
    copy(child = c)
  override def prettyName: String = "top_centroids"
}

object VectorLshFunctions {
  def hyperplaneSignature(v: Column, planes: Int = 16): Column =
    bridge.toColumn(HyperplaneSignature(bridge.toExpression(v), planes))
  def topCentroids(v: Column, nCentroids: Int, k: Int): Column =
    bridge.toColumn(TopCentroids(bridge.toExpression(v), nCentroids, k))
  def nearestCentroid(v: Column, nCentroids: Int): Column =
    topCentroids(v, nCentroids, 1).getItem(0)
}
