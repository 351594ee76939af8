package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Streaming monitoring (reference spark_streaming/streaming_job.py:632-687):
  * per-batch input rows, processing rate, batch duration, state-operator
  * rows, and a slow-batch alert above a threshold — the reference warns at
  * 5 s (streaming_job.py:96,574-583). Collected driver-side off the
  * listener bus; query code never pays for it.
  */
final class Metrics(slowBatchMillis: Long = 5000L) extends StreamingQueryListener {

  final case class BatchStat(
      batchId: Long,
      numInputRows: Long,
      durationMs: Long,
      stateRows: Long,
      slow: Boolean)

  private val stats = new ConcurrentLinkedQueue[BatchStat]()
  @volatile var started = 0
  @volatile var terminated = 0

  def batches: List[BatchStat] = stats.asScala.toList
  def totalInputRows: Long = batches.map(_.numInputRows).sum
  def slowBatches: List[BatchStat] = batches.filter(_.slow)

  /** The collected stats as a queryable DataFrame — the reference exposes
    * its monitor numbers for dashboards/alerting (streaming_job.py:632-687);
    * here they are a table to filter/aggregate/join like any other. Driver-
    * local by construction (listener stats are metadata-sized: one row per
    * micro-batch). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    batches.map(b => (b.batchId, b.numInputRows, b.durationMs, b.stateRows, b.slow))
      .toDF("batch_id", "num_input_rows", "duration_ms", "state_rows", "slow")
  }

  /** The slow-batch alert view: batches whose trigger execution exceeded the
    * threshold (the reference warns above 5 s, streaming_job.py:96,574-583 —
    * its backpressure signal for raising maxOffsetsPerTrigger headroom). */
  def alerts(spark: SparkSession): DataFrame = toDF(spark).filter(col("slow"))

  override def onQueryStarted(event: QueryStartedEvent): Unit = started += 1

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    stats.add(BatchStat(p.batchId, p.numInputRows, duration, stateRows,
      duration > slowBatchMillis))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminated += 1
}
