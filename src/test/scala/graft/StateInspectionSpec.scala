package graft

import graft.log.LogWriter
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint state inspection via Spark's state data sources: the
  * engine-side answer to "what is this consumer's state right now?" —
  * the reference's analog is attaching to a live GenServer and dumping
  * its state map (/root/reference/lib/redix/stream/consumer.ex:10-18,
  * the consumer's %{...} state). Here state lives in the checkpoint, so
  * it is queryable OFFLINE as a DataFrame: `state-metadata` lists the
  * stateful operators a checkpoint holds, `statestore` reads a store's
  * key/value rows — both usable for debugging a stuck query, auditing
  * watermark-pruned state size, or migrating state between jobs.
  */
class StateInspectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("statestore source reads a streaming agg's checkpointed counts") {
    val root = TestSpark.tmpDir("slog")
    var now = 0L
    val w = new LogWriter(root, "ev", () => now)
    now = 1000L; w.produce(Map("k" -> "a"))
    now = 2000L; w.produce(Map("k" -> "a"))
    now = 3000L; w.produce(Map("k" -> "b"))
    val ckpt = TestSpark.tmpDir("ckpt")
    val q = spark.readStream.format("graftlog")
      .option("path", root).option("stream", "ev")
      .option("startingOffsets", "earliest").load()
      .selectExpr("values['k'] AS k")
      .groupBy("k").count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("stateagg").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()

    // operator inventory of the checkpoint
    val meta = spark.read.format("state-metadata").load(ckpt)
    val ops = meta.select("operatorName").collect().map(_.getString(0)).toSet
    assert(ops.contains("stateStoreSave"))

    // the HashAggregate state: key = k, value carries the count
    val state = spark.read.format("statestore").load(ckpt)
    val counts = state.selectExpr("key.k", "value.count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 2L, "b" -> 1L))
  }
}
