package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{SaveMode, SparkSession}

/**
 * Run-scoped metrics collection (reference analog: the PerformanceMetric
 * time-series in database_manager.py:153-172 and the 30s sampler in
 * progress_tracker.py:190-206) — implemented as a SparkListener, so metrics
 * reflect actual task execution, not a wall-clock sampler.
 *
 * One row per completed stage: tasks, records, bytes, executor run/GC time,
 * shuffle bytes, peak memory. Written to a `metrics` parquet table per run.
 */
object MetricsListener {
  final case class StageAgg(
      var tasks: Long = 0,
      var recordsRead: Long = 0,
      var bytesRead: Long = 0,
      var shuffleWriteBytes: Long = 0,
      var shuffleReadBytes: Long = 0,
      var runTimeMs: Long = 0,
      var gcTimeMs: Long = 0,
      var peakMemory: Long = 0,
      var failed: Long = 0
  )

  final case class MetricRow(
      run_id: String, stage_id: Int, tasks: Long, failed_tasks: Long,
      records_read: Long, bytes_read: Long, shuffle_read_bytes: Long,
      shuffle_write_bytes: Long, run_time_ms: Long, gc_time_ms: Long,
      peak_memory: Long)
}

final class MetricsListener extends SparkListener {
  import MetricsListener._

  private val stages = new ConcurrentHashMap[Int, StageAgg]()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val agg = stages.computeIfAbsent(e.stageId, _ => StageAgg())
    agg.synchronized {
      agg.tasks += 1
      if (e.taskInfo != null && !e.taskInfo.successful) agg.failed += 1
      val m = e.taskMetrics
      if (m != null) {
        agg.recordsRead += m.inputMetrics.recordsRead
        agg.bytesRead += m.inputMetrics.bytesRead
        agg.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        agg.shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
        agg.runTimeMs += m.executorRunTime
        agg.gcTimeMs += m.jvmGCTime
        agg.peakMemory = math.max(agg.peakMemory, m.peakExecutionMemory)
      }
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()

  def write(spark: SparkSession, runId: String, path: String): Unit = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val rows = stages.asScala.toSeq.sortBy(_._1).map { case (sid, a) =>
      MetricRow(runId, sid, a.tasks, a.failed, a.recordsRead, a.bytesRead,
        a.shuffleReadBytes, a.shuffleWriteBytes, a.runTimeMs, a.gcTimeMs, a.peakMemory)
    }
    if (rows.nonEmpty)
      rows.toDF().write.mode(SaveMode.Append).parquet(path)
  }
}
