package graft.operators

import graft.log.LogId
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Stream introspection — the engine's XLEN / XINFO STREAM / XINFO GROUPS
  * surface. The reference leans on the Redis server for ALL observability
  * (/root/reference/README.md:20 — the consumer never inspects the stream,
  * it just reads); an operator running a consumer fleet against the engine
  * needs the same answers as DataFrames: how long is each stream, where is
  * its high water, where is each group, and how far behind is it.
  *
  * Scale posture: entry counts and high-water marks are computed THROUGH
  * the DSv2 source (distributed scan, payload map never materialized —
  * only stream/ts/seq columns are read), not by driver-side segment
  * decode; committed offsets are O(#groups) tiny checkpoint-metadata file
  * reads on the driver — observability metadata, not data.
  */
object StreamInspect {

  /** XLEN + XINFO STREAM analog: per-stream visible entry count, first id,
    * and high-water id. Tombstones are excluded (XLEN counts real entries;
    * the reference skips tombstones before the handler too,
    * /root/reference/lib/redix/stream/consumer.ex:286).
    */
  def streamInfo(s: SparkSession, root: String, streams: Seq[String]): DataFrame = {
    import s.implicits._
    s.read.format("graftlog")
      .option("path", root).option("stream", streams.mkString(","))
      .load()
      .select($"stream", unix_millis($"ts").as("ms"), $"seq")
      .groupBy($"stream")
      .agg(count(lit(1)).as("n_entries"),
        min(struct($"ms", $"seq")).as("lo"),
        max(struct($"ms", $"seq")).as("hi"))
      .select($"stream", $"n_entries",
        concat($"lo.ms".cast("string"), lit("-"), $"lo.seq".cast("string"))
          .as("first_id"),
        concat($"hi.ms".cast("string"), lit("-"), $"hi.seq".cast("string"))
          .as("high_water"))
  }

  /** Per-stream committed offsets of one consumer group's checkpoint: the
    * offset file of the LAST batch recorded in `commits/` (offsets/N is the
    * end of batch N, commits/N marks it done — the same convention
    * [[graft.consumer.GraftConsumer]] replays by). Empty when nothing
    * committed yet. Both the flat single-stream and the multi-stream
    * `{"streams":...}` offset wire formats parse.
    */
  def committedOffsets(checkpointDir: String, defaultStream: String): Map[String, LogId] = {
    val commits = Paths.get(checkpointDir, "commits")
    if (!Files.isDirectory(commits)) Map.empty
    else {
      val batches = Files.list(commits).iterator().asScala
        .flatMap(p => p.getFileName.toString.toLongOption).toSeq
      if (batches.isEmpty) Map.empty
      else {
        val offsetFile = Paths.get(checkpointDir, "offsets", batches.max.toString)
        Files.readAllLines(offsetFile, StandardCharsets.UTF_8).asScala
          .flatMap(l => scala.util.Try(
            graft.sources.GraftLogOffset.parse(l.trim, defaultStream)).toOption)
          .headOption.map(_.ids).getOrElse(Map.empty)
      }
    }
  }

  /** XINFO GROUPS analog: one row per (group, stream) with the group's
    * committed id and its lag — the count of visible entries above the
    * committed offset. Groups that have not committed sit at `0-0` with
    * lag = the whole stream. The lag count runs through the distributed
    * source scan with the (tiny) committed-offset table broadcast; nothing
    * funnels through the driver but the checkpoint metadata reads.
    */
  def groupLag(s: SparkSession, root: String, streams: Seq[String],
      groups: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    val committed = groups.flatMap { case (g, ckpt) =>
      val m = committedOffsets(ckpt, streams.head)
      streams.map { st =>
        val id = m.getOrElse(st, LogId.Zero)
        (g, st, id.millis, id.seq, id.toString)
      }
    }
    val cds = s.createDataFrame(committed)
      .toDF("grp", "stream", "c_ms", "c_seq", "committed_id")
    val log = s.read.format("graftlog")
      .option("path", root).option("stream", streams.mkString(","))
      .load()
      .select($"stream".as("st"), unix_millis($"ts").as("ms"), $"seq")
    val behind = log.join(broadcast(cds),
        $"st" === $"stream" &&
          ($"ms" > $"c_ms" || ($"ms" === $"c_ms" && $"seq" > $"c_seq")))
      .groupBy($"grp", $"stream").agg(count(lit(1)).as("lag"))
    cds.select($"grp", $"stream", $"committed_id")
      .join(behind, Seq("grp", "stream"), "left")
      .join(streamInfo(s, root, streams).select($"stream", $"high_water"),
        Seq("stream"), "left")
      .select($"grp", $"stream", $"committed_id", $"high_water",
        coalesce($"lag", lit(0L)).as("lag"))
  }
}
