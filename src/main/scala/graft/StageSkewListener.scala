package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-stage task-time attribution for the matrix campaigns: prints, at
  * stage completion, the task count, total/max/avg task wall time and
  * input/shuffle volume — enough to tell a SKEWED stage (max ≫ avg, a
  * few tasks own the wall clock) from a uniformly slow one (avg itself
  * is the cost) without the Spark UI (disabled in the harness) or event
  * logs. Registered by [[Matrix]] when `SPARK_GRAFT_STAGE_METRICS=1`;
  * the reference's analogue is its per-thread timing instrumentation
  * (README-2.txt discusses per-stage attribution of the barriers).
  */
final class StageSkewListener extends SparkListener {

  private final class Agg {
    var n: Int = 0
    var sumMs: Long = 0L
    var maxMs: Long = 0L
    var inRecords: Long = 0L
    var outRecords: Long = 0L
    var shufReadB: Long = 0L
    var shufWriteB: Long = 0L
  }

  private val byStage = new java.util.concurrent.ConcurrentHashMap[Int, Agg]

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val a = byStage.computeIfAbsent(e.stageId, _ => new Agg)
    a.synchronized {
      a.n += 1
      a.sumMs += e.taskInfo.duration
      a.maxMs = math.max(a.maxMs, e.taskInfo.duration)
      val m = e.taskMetrics
      if (m != null) {
        a.inRecords += m.inputMetrics.recordsRead
        a.outRecords += m.outputMetrics.recordsWritten
        a.shufReadB += m.shuffleReadMetrics.totalBytesRead
        a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val a = byStage.remove(e.stageInfo.stageId)
    // only stages that cost real time — the harness runs hundreds of
    // sub-second bookkeeping stages that would bury the signal
    if (a != null && a.sumMs >= 2000) a.synchronized {
      val name = e.stageInfo.name.takeWhile(_ != '\n').take(72)
      System.err.println(
        f"[stage ${e.stageInfo.stageId}%5d] tasks=${a.n}%4d " +
          f"sum=${a.sumMs / 1000.0}%8.1f s max=${a.maxMs / 1000.0}%7.2f s " +
          f"avg=${a.sumMs / math.max(1, a.n) / 1000.0}%6.2f s " +
          f"inRec=${a.inRecords}%12d shufR=${a.shufReadB >> 20}%6d MB " +
          f"shufW=${a.shufWriteB >> 20}%6d MB  $name")
    }
  }
}
