package graft.streaming

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability (SURVEY.md §2 A24): the reference's Lambda
  * publishes per-invocation metrics and logs to CloudWatch
  * (/root/reference/README.md architecture); the Spark-native
  * counterpart is a [[StreamingQueryListener]] that captures every
  * micro-batch's progress — rows, rates, trigger latency, watermark —
  * into a bounded in-memory ring exposed as a DataFrame, so the same
  * engine that runs the pipeline can also query its health
  * (`metrics(spark).where($"triggerMs" > 10000)` is the
  * slow-batch alert).
  *
  * Driver-side and bounded by design: one small case-class row per
  * micro-batch, capped at `capacity` (oldest evicted), never a
  * per-record hook — observability must not become the hot path. The
  * ring is lock-free (ConcurrentLinkedDeque); `metrics` copies a
  * snapshot into a local relation, which is exactly the
  * bounded-driver-collect pattern the rest of the engine allows
  * (IVF centroids, mix cutoffs).
  *
  * Attach once per session ([[attach]]), observe every query, or
  * restrict to one query by name. For durable history, land
  * `metrics(spark)` periodically beside the lake — it is a plain
  * DataFrame.
  */
final class StreamMetrics(capacity: Int = 1024,
                          queryName: Option[String] = None)
    extends StreamingQueryListener {
  require(capacity >= 1, "capacity must be >= 1")

  import StreamMetrics.BatchMetric

  private val ring = new ConcurrentLinkedDeque[BatchMetric]()
  // Deque.size is O(n); the listener bus delivers events single-
  // threaded, so a plain counter makes eviction O(1)
  private val ringSize = new java.util.concurrent.atomic.AtomicInteger(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    if (queryName.forall(n => n == p.name)) {
      def dur(k: String): Long =
        Option(p.durationMs.get(k)).map(_.longValue).getOrElse(-1L)
      ring.addLast(BatchMetric(
        queryName = Option(p.name).getOrElse(""),
        batchId = p.batchId,
        timestamp = p.timestamp,
        numInputRows = p.numInputRows,
        inputRowsPerSecond = orZero(p.inputRowsPerSecond),
        processedRowsPerSecond = orZero(p.processedRowsPerSecond),
        triggerMs = dur("triggerExecution"),
        addBatchMs = dur("addBatch"),
        stateRows = p.stateOperators.map(_.numRowsTotal).sum,
        watermark = Option(p.eventTime.get("watermark")).getOrElse("")))
      ringSize.incrementAndGet()
      while (ringSize.get > capacity && ring.pollFirst() != null)
        ringSize.decrementAndGet()
    }
  }

  private def orZero(v: Double): Double = if (v.isNaN) 0.0 else v

  /** Snapshot of the captured batches as a relation (oldest first). */
  def metrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    ring.iterator.asScala.toSeq.toDF()
  }

  /** Registers this listener on the session's stream manager. */
  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit =
    spark.streams.removeListener(this)
}

object StreamMetrics {
  /** One micro-batch's health row. `triggerMs` is the whole trigger
    * (the number a 10 s trigger must stay under); `addBatchMs` is the
    * sink's share (the 13-way fan-out for `EventStream.start`).
    * `stateRows` totals the stateful operators' kept rows — the
    * watermark-bounded state whose growth is the first sign of a
    * misconfigured lateness bound. */
  final case class BatchMetric(queryName: String, batchId: Long,
                               timestamp: String, numInputRows: Long,
                               inputRowsPerSecond: Double,
                               processedRowsPerSecond: Double,
                               triggerMs: Long, addBatchMs: Long,
                               stateRows: Long, watermark: String)
}
