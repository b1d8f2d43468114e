package graft.log

/** Entry id / position in a graft stream log: `"<millis>-<seq>"`, totally
  * ordered per stream, doubling as the consumer's read position — mirrors the
  * reference's Redis stream ids (/root/reference/lib/stream.ex:21-23 asserts
  * the two-part shape; /root/reference/lib/redix/stream/consumer.ex:303-313
  * threads the last id as the next read position).
  */
final case class LogId(millis: Long, seq: Long) extends Ordered[LogId] {
  def compare(that: LogId): Int = {
    val c = java.lang.Long.compare(millis, that.millis)
    if (c != 0) c else java.lang.Long.compare(seq, that.seq)
  }
  override def toString: String = s"$millis-$seq"
}

object LogId {
  /** Position before any real entry — "read from the start of the stream". */
  val Zero: LogId = LogId(0L, 0L)

  /** Exclusive-start position just below `millis`: the first id AT OR AFTER
    * that millisecond sorts strictly above it (any seq). The one encoding of
    * "start at time T" shared by the batch planner and the streaming
    * startingTimestamp resolution.
    */
  def startBefore(millis: Long): LogId =
    if (millis <= 0) Zero else LogId(millis - 1, Long.MaxValue)

  private val Pattern = "^(\\d+)-(\\d+)$".r

  def parse(s: String): LogId = s match {
    case Pattern(m, q) => LogId(m.toLong, q.toLong)
    case _ => throw new IllegalArgumentException(s"malformed log id: '$s'")
  }

  def tryParse(s: String): Option[LogId] = s match {
    case Pattern(m, q) => Some(LogId(m.toLong, q.toLong))
    case _ => None
  }
}
