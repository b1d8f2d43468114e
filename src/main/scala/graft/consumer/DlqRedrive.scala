package graft.consumer

import graft.log.{LogId, LogStore, LogWriter}

/** DLQ RE-DRIVE — the operational completion of the dead-letter loop a
  * real operator runs weekly: park → inspect → fix → REPLAY. Moves parked
  * messages back onto their source stream and empties the DLQ.
  *
  * Contract:
  *  - each parked message re-enters its ORIGINAL stream (`__dlq_stream`
  *    provenance) as a NEW entry — fresh id, so the group ledger sees a
  *    fresh message and delivery attempts reset by construction;
  *  - provenance is retained across the replay: `__redrive_of` (the
  *    original entry id), `__redrive_attempts` (the failed-delivery count
  *    at park time) and `__redrive_error` (the parking error) ride the
  *    re-driven values; the `__dlq_*` envelope itself is stripped;
  *  - the DLQ is trimmed past the re-driven entries afterwards, so a
  *    repeated redrive is a no-op — re-INJECTION is exactly-once at the
  *    operator level, and exactly-once PROCESSING of the re-driven
  *    entries is the group ledger's existing contract (q399/q404).
  *
  * Driver-side and bounded by the DLQ size — a dead-letter queue holds
  * the poison messages an operator inspects by hand (the q404 PEL
  * posture); re-injection goes through `produceAll` (bulk segment
  * append), never per-entry `produce`.
  */
object DlqRedrive {

  final case class Result(redriven: Long, perStream: Map[String, Long])

  private val Envelope =
    Seq("__dlq_stream", "__dlq_id", "__dlq_attempts", "__dlq_error")

  def redrive(logRoot: String, dlqStream: String): Result = {
    if (!LogStore.exists(logRoot, dlqStream)) return Result(0L, Map.empty)
    val hi = LogStore.maxId(logRoot, dlqStream)
    val parked = LogStore
      .readRange(logRoot, dlqStream, LogId(0L, 0L), hi)
      .filterNot(_.isTombstone)
    val byStream = parked.groupBy(e => e.values.getOrElse("__dlq_stream",
      throw new IllegalArgumentException(
        s"DLQ entry ${e.id} lacks __dlq_stream provenance — refusing to " +
          "re-drive a message whose origin is unknown")))
    byStream.foreach { case (stream, entries) =>
      val w = new LogWriter(logRoot, stream)
      w.produceAll(entries.map { e =>
        (e.values -- Envelope) ++ Map(
          "__redrive_of" -> e.values.getOrElse("__dlq_id", e.id.toString),
          "__redrive_attempts" -> e.values.getOrElse("__dlq_attempts", "0"),
          "__redrive_error" -> e.values.getOrElse("__dlq_error", ""))
      })
    }
    if (parked.nonEmpty) LogStore.trim(logRoot, dlqStream, hi)
    Result(parked.size.toLong,
      byStream.map { case (k, v) => k -> v.size.toLong })
  }
}
