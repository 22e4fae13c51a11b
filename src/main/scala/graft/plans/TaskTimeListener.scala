package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Sums executor task run time — lets the bench report WORK CONSERVATION
  * across parallelism levels: total task-seconds at N cores vs 4N cores.
  * A ratio ≈ 1 shows the engine introduces no parallel overhead (no extra
  * shuffle work, no duplicated compute) even when host wall-clock is
  * polluted by co-tenant noise.
  */
class TaskTimeListener extends SparkListener {
  private val runTimeMs = new LongAdder
  private val cpuTimeNs = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      runTimeMs.add(m.executorRunTime)
      cpuTimeNs.add(m.executorCpuTime)
    }
  }

  def taskSeconds: Double = runTimeMs.sum() / 1e3
  def cpuSeconds: Double = cpuTimeNs.sum() / 1e9
  def reset(): Unit = { runTimeMs.reset(); cpuTimeNs.reset() }
}
