package graft.cdc

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Always-on ingest observability — the Spark-native replacement for the
  * reference's cron-window alerting and Slack error notifications
  * (`wake_me_when_found` availability alerting, reference:
  * launchpad.py:107-113, 314-319; `notify.py:3-36`): a
  * `StreamingQueryListener` that captures per-batch progress (rows/sec,
  * batch duration, source offsets) and terminal events. A deployment
  * would forward [[alerts]] to its pager; here they accumulate in
  * memory and are queryable/assertable.
  *
  * `stalenessAlert(maxSilentMs)` implements the reference's inverted
  * FileNotFound pattern: alert when the feed has gone quiet — no data
  * processed for longer than the cron window — rather than when a file
  * is missing once.
  */
final class ProgressListener(maxStats: Int = 4096)
    extends StreamingQueryListener {
  final case class BatchStat(queryName: String, batchId: Long,
      numInputRows: Long, processedRowsPerSecond: Double, durationMs: Long,
      timestamp: String)

  private val batches = new ConcurrentLinkedQueue[BatchStat]()
  private val batchCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val terminal = new ConcurrentLinkedQueue[String]()
  @volatile private var lastDataMs: Long = System.currentTimeMillis()
  // per-query-NAME freshness: listeners are session-global, so in a
  // multi-query session (ingest feed + mirror, two feeds) the aggregate
  // clock above is reset by ANY query's data and can mask one feed going
  // dark forever — the exact alert this class exists to raise
  private val lastDataByQuery =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    // baseline: a feed that never delivers a single row must still
    // eventually trip the per-query alert
    Option(e.name).foreach(
      lastDataByQuery.putIfAbsent(_, System.currentTimeMillis()))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    batches.add(BatchStat(Option(p.name).getOrElse(""), p.batchId,
      p.numInputRows, p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      p.timestamp))
    // bounded ring, one-in-one-out at capacity: always-on deployments
    // trigger every few seconds and an untrimmed queue grows until the
    // driver OOMs. The explicit counter keeps this O(1) —
    // ConcurrentLinkedQueue.size is an O(n) traversal, and this runs on
    // the shared listener-bus thread.
    if (batchCount.incrementAndGet() > maxStats) {
      batches.poll()
      batchCount.decrementAndGet(): Unit
    }
    if (p.numInputRows > 0) {
      lastDataMs = System.currentTimeMillis()
      Option(p.name).foreach(
        lastDataByQuery.put(_, System.currentTimeMillis()))
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    e.exception.foreach(msg => terminal.add(msg))

  /** Per-batch stats observed so far (oldest first). */
  def batchStats: Seq[BatchStat] = {
    val it = batches.iterator()
    val b = Seq.newBuilder[BatchStat]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Terminal failures observed (empty = healthy). */
  def alerts: Seq[String] = {
    val it = terminal.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** True when no batch of ANY query has carried data for longer than
    * `maxSilentMs` — the "source went dark" alert for the single-query
    * session. With several queries on the session, use the per-query
    * overload: here one healthy feed keeps resetting the shared clock
    * and would mask another going dark. */
  def stalenessAlert(maxSilentMs: Long): Boolean =
    System.currentTimeMillis() - lastDataMs > maxSilentMs

  /** Per-query staleness: true when the NAMED query (writeStream
    * `.queryName(...)`) has carried no data for `maxSilentMs` — also true
    * for a name never seen at all (a feed that failed to start is the
    * darkest kind of dark). */
  def stalenessAlert(maxSilentMs: Long, queryName: String): Boolean =
    System.currentTimeMillis() -
      lastDataByQuery.getOrDefault(queryName, 0L) > maxSilentMs
}

object ProgressListener {
  /** Attach a fresh listener to the session; caller keeps the reference
    * and should `remove` it when the query stops. */
  def attach(spark: SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.streams.addListener(l)
    l
  }

  def remove(spark: SparkSession, l: ProgressListener): Unit =
    spark.streams.removeListener(l)
}
