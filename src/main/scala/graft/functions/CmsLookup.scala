package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd probe into a broadcast Count-Min sketch:
  * `estimateCount(key) >= threshold`, i.e. "might this key be a heavy
  * hitter". CMS only over-counts, so `true` is a superset of the truth —
  * the standard sketch-prune contract (candidates re-checked exactly
  * downstream, same role as the reference's FM sketch feeding an exact
  * pass, q4112.c:336-377).
  *
  * Exists because a Scala UDF in a scan filter breaks whole-stage
  * codegen for the entire stage; this expression keeps the candidate
  * filter fused into the scan (same pattern as
  * [[DenseArrayLookup]]). Scale shape: the sketch is a few hundred KB
  * broadcast once per executor; the probe side never moves, and rows
  * failing the filter die before the shuffle.
  */
case class CmsMightBeHeavy(
    child: Expression,
    cms: Broadcast[CountMinSketch],
    threshold: Long)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint key")
    }

  override def nullSafeEval(key: Any): Any =
    cms.value.estimateCount(key.asInstanceOf[Long]) >= threshold

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the small Broadcast handle; generated code resolves the
    // executor-local sketch once per task
    val bcRef = ctx.addReferenceObj("cmsBroadcast", cms,
      classOf[Broadcast[CountMinSketch]].getName)
    val sketch = ctx.addMutableState(classOf[CountMinSketch].getName, "cmsSketch",
      v => s"$v = (${classOf[CountMinSketch].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $sketch.estimateCount(java.lang.Long.valueOf($c)) >= ${threshold}L;")
  }

  override protected def withNewChildInternal(c: Expression): CmsMightBeHeavy =
    copy(child = c)
  override def prettyName: String = "cms_might_be_heavy"
}

object CmsLookup {
  /** Column wrapper: `mightBeHeavy(bc, threshold)(keyCol)`. */
  def mightBeHeavy(cms: Broadcast[CountMinSketch], threshold: Long)(key: Column): Column =
    bridge.toColumn(CmsMightBeHeavy(bridge.toExpression(key), cms, threshold))
}
