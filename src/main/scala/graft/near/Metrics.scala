package graft.near

import java.util.concurrent.atomic.AtomicLong

/** Indexer metrics (SURVEY S9, indexer/src/metrics.rs:6-55): the
  * block counter and latest-height gauge, exposed in Prometheus text
  * format over HTTP (JDK built-in server — default port 3030 like the
  * reference, configs.rs:36-38). Stream.processBatch records into
  * these; a StreamingQueryListener additionally tracks microbatch
  * progress rows.
  */
object Metrics {

  val blockCount = new AtomicLong(0)
  val latestBlockHeight = new AtomicLong(0)
  val microbatchCount = new AtomicLong(0)
  val lineageFullRescans = new AtomicLong(0)
  val lineageRescanReceipts = new AtomicLong(0)
  val pendingDroppedReceipts = new AtomicLong(0)

  def recordBatch(blocks: Long, maxHeight: Long): Unit = {
    blockCount.addAndGet(blocks)
    latestBlockHeight.getAndUpdate(h => math.max(h, maxHeight))
  }

  /** A mirrorless lineage pass left `rows` frontier entries unresolved
    * after the PRUNED warehouse scan — the batch fell back to an
    * unpruned rescan of the residue (Stream.processBatch). A steadily
    * climbing counter says the lookback is too short for the delivery
    * pattern, or a mirror should be configured.
    */
  def recordLineageFullRescan(rows: Long): Unit = {
    lineageFullRescans.incrementAndGet()
    lineageRescanReceipts.addAndGet(rows)
    System.err.println(s"[graft-stream] pruned lineage recovery left " +
      s"$rows receipts unresolved; retrying residue against full history")
  }

  /** Non-strict mode dropped `rows` receipts whose parents never
    * resolved within the retry budget (per-receipt warns are emitted
    * at the drop site, Stream.processBatch — receipts.rs:93-104).
    */
  def recordPendingDropped(rows: Long): Unit = {
    pendingDroppedReceipts.addAndGet(rows); ()
  }

  def reset(): Unit = {
    blockCount.set(0); latestBlockHeight.set(0); microbatchCount.set(0)
    lineageFullRescans.set(0); lineageRescanReceipts.set(0)
    pendingDroppedReceipts.set(0)
  }

  /** Prometheus text exposition (metric names mirror the reference's). */
  def prometheusText: String =
    s"""# TYPE indexer_explorer_block_count counter
       |indexer_explorer_block_count ${blockCount.get}
       |# TYPE indexer_explorer_latest_block_height gauge
       |indexer_explorer_latest_block_height ${latestBlockHeight.get}
       |# TYPE indexer_explorer_microbatch_count counter
       |indexer_explorer_microbatch_count ${microbatchCount.get}
       |# TYPE indexer_explorer_lineage_full_rescans counter
       |indexer_explorer_lineage_full_rescans ${lineageFullRescans.get}
       |# TYPE indexer_explorer_lineage_rescan_receipts counter
       |indexer_explorer_lineage_rescan_receipts ${lineageRescanReceipts.get}
       |# TYPE indexer_explorer_pending_dropped_receipts counter
       |indexer_explorer_pending_dropped_receipts ${pendingDroppedReceipts.get}
       |""".stripMargin

  /** Serve GET /metrics; returns the server (call .stop(0) to close). */
  def serve(port: Int = 3030): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/metrics",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val body = prometheusText.getBytes("UTF-8")
        exchange.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4")
        exchange.sendResponseHeaders(200, body.length)
        val os = exchange.getResponseBody
        os.write(body); os.close()
      })
    server.start()
    server
  }

  /** Microbatch progress listener: counts completed microbatches
    * (the lag-alarm feed, TROBLESHOOTING.md "How to catch the tip").
    */
  def listener(): org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        microbatchCount.incrementAndGet(); ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
}
