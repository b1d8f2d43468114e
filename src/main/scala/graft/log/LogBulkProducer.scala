package graft.log

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import java.nio.file.{Files, StandardCopyOption}

/** Distributed explicit-timestamp bulk produce — the scale path for
  * bootstrapping a stream log from a table (event-time replay fixtures,
  * backfills, log migrations).
  *
  * [[LogWriter]] is the reference-parity API: ONE sequencer assigns ids
  * under the per-stream lock (≙ Redis XADD's single-threaded id rule,
  * /root/reference/lib/stream.ex:25-38), which makes every append a
  * driver-side funnel — correct for live produce, a bottleneck for bulk
  * ingest (a 10M-row backfill would materialize on one node). Here the id
  * of every row is already determined by the data itself (explicit
  * timestamps = the `<ms>-*` XADD form), so assignment needs no sequencer:
  *
  *   1. `seq` within each millisecond via `row_number()` (one hash shuffle
  *      on the millisecond — ids are (ms, seq), exactly what
  *      [[LogWriter.produceAllAt]] would assign for the same ordering);
  *   2. range-partition by (ms, seq) so executors own disjoint id ranges;
  *   3. each task encodes and publishes its own segment files directly
  *      (tmp + atomic rename, same crash contract as the single writer).
  *
  * No row ever passes through the driver. Requires a FRESH stream (empty or
  * absent): concurrent single-writer appends and bulk produce cannot both
  * hold the id high-water, and a bootstrap never needs them to. Publish
  * order across tasks is arbitrary — acceptable only because nothing reads
  * a stream that is still being bootstrapped; live producers keep the
  * in-order publish contract of [[LogWriter.produceAll]].
  */
object LogBulkProducer {

  /** Produce every row of `df` into `root/stream` with ids
    * `(row[msCol], seq)`; returns the entry count. `orderCols` orders rows
    * within one millisecond (the seq tiebreak) — make it a total order if
    * distinct payloads share a millisecond and the payload→seq mapping must
    * be reproducible. All non-`msCol` columns become the payload, coerced
    * to_string like every produce path (null → "").
    */
  def produceAt(df: DataFrame, msCol: String, root: String, stream: String,
      orderCols: Seq[String], maxSegmentEntries: Int = 10000): Long = {
    require(orderCols.nonEmpty, "orderCols must not be empty (seq tiebreak)")
    LogStore.ensureStream(root, stream)
    require(LogStore.maxId(root, stream) == LogId.Zero,
      s"bulk produce requires a fresh stream; '$stream' already has entries " +
        "(use LogWriter for appends to a live stream)")
    val payloadCols = df.columns.filterNot(_ == msCol).toSeq
    require(payloadCols.nonEmpty, "no payload columns besides the timestamp")
    val coerced = df.select(
      (col(msCol).cast("long").as("__ms") +:
        payloadCols.map(c => coalesce(col(c).cast("string"), lit("")).as(c))): _*)
    val n = coerced.count()
    if (n == 0L) return 0L
    val numSegments = math.max(1L, (n + maxSegmentEntries - 1) / maxSegmentEntries).toInt
    val w = Window.partitionBy(col("__ms")).orderBy(orderCols.map(col): _*)
    val withIds = coerced
      .withColumn("__seq", row_number().over(w).cast("long") - 1L)
      .repartitionByRange(numSegments, col("__ms"), col("__seq"))
      .sortWithinPartitions(col("__ms"), col("__seq"))
    val payloadNames = payloadCols // serializable copy for the closure
    withIds.foreachPartition { (it: Iterator[Row]) =>
      val entries = it.map { r =>
        val ms = r.getAs[Long]("__ms")
        require(ms >= 0, s"negative timestamp $ms")
        LogEntry(LogId(ms, r.getAs[Long]("__seq")),
          payloadNames.map(c => c -> r.getAs[String](c)).toMap)
      }
      entries.grouped(maxSegmentEntries).foreach { chunk =>
        if (chunk.nonEmpty) writeTaskSegment(root, stream, chunk)
      }
    }
    n
  }

  /** Executor-side segment publish: unique tmp (task attempts must not
    * clobber each other's staging) then atomic rename. Ids are data-derived,
    * so a retried/speculative attempt rewrites identical content — replacing
    * an existing segment of the same name is safe, unlike the live-writer
    * path where a name collision means duplicate id assignment.
    */
  private def writeTaskSegment(root: String, stream: String,
      chunk: Seq[LogEntry]): Unit = {
    val dir = LogStore.streamDir(root, stream)
    val name = s"${chunk.head.id}__${chunk.last.id}.jsonl"
    val tmp = dir.resolve(s".$name.${java.util.UUID.randomUUID()}.tmp")
    val bytes = chunk.iterator.map(LogStore.encodeLine)
      .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Files.write(tmp, bytes)
    try Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
