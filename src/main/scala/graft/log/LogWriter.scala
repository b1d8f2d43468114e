package graft.log

/** Producer for a stream log — the engine's `produce` (≙ XADD,
  * /root/reference/lib/stream.ex:25-38): values are coerced to strings
  * (`to_string/1` rule, /root/reference/lib/stream.ex:15-16), the id is
  * assigned server-side as `"<millis>-<seq>"` with seq disambiguating
  * same-millisecond appends (the Redis id rule the reference's doctest
  * asserts, /root/reference/lib/stream.ex:21-23).
  *
  * Id assignment is serialized per writer; on construction the writer resumes
  * after the highest id already in the log, so restart never regresses ids.
  * (At 100 TB one stream = one ordered shard by design, as in Redis; scale-out
  * is many streams, each with its own writer.)
  */
final class LogWriter(root: String, stream: String,
    clock: () => Long = () => System.currentTimeMillis()) {

  LogStore.ensureStream(root, stream)
  private var last: LogId = LogStore.maxId(root, stream)

  private def nextId(): LogId = {
    val now = clock()
    last = if (now > last.millis) LogId(now, 0L) else LogId(last.millis, last.seq + 1)
    last
  }

  /** Coerce any payload value the way the reference does (`to_string/1`). */
  def coerce(values: Map[String, Any]): Map[String, String] =
    values.map { case (k, v) => k -> (if (v == null) "" else String.valueOf(v)) }

  /** Append one entry; returns its assigned id. */
  def produce(values: Map[String, Any]): LogId = synchronized {
    val entry = LogEntry(nextId(), coerce(values))
    LogStore.writeSegment(root, stream, Seq(entry))
    entry.id
  }

  /** Append a batch as one segment; returns the assigned ids in order. */
  def produceAll(batch: Seq[Map[String, Any]]): Seq[LogId] = synchronized {
    if (batch.isEmpty) Nil
    else {
      val entries = batch.map(v => LogEntry(nextId(), coerce(v)))
      LogStore.writeSegment(root, stream, entries)
      entries.map(_.id)
    }
  }

  /** Write the tombstone used to materialize an empty stream
    * (≙ MKSTREAM's dummy entry; consumers skip it).
    */
  def produceTombstone(): LogId = synchronized {
    val entry = LogEntry(nextId(), LogEntry.TombstoneValues)
    LogStore.writeSegment(root, stream, Seq(entry))
    entry.id
  }
}
