package graft.log

/** One stream entry: server-assigned id plus a flat string→string payload —
  * the reference's data model exactly (schemaless map of strings,
  * /root/reference/lib/redix/stream/consumer.ex:283-285; values coerced with
  * to_string on produce, /root/reference/lib/stream.ex:15-16).
  */
final case class LogEntry(id: LogId, values: Map[String, String]) {
  /** The sentinel written so a stream exists before a group is created on
    * it; consumers skip it without invoking the handler
    * (/root/reference/lib/redix/stream/consumer.ex:286, :295).
    */
  def isTombstone: Boolean = values == LogEntry.TombstoneValues
}

object LogEntry {
  val TombstoneValues: Map[String, String] = Map("" -> "")
}
