package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one build-and-drain harness behind every engine-streaming oracle
  * query (q78/q91/q94/q105/q107/q115/q120/q125/q128/q131/q138/q139): pins the state-store
  * sizing confs for the duration of `start()` (safe to restore right after —
  * the stream clones the session conf synchronously inside start), runs the
  * plan into a fresh uniquely-named memory sink under Trigger.AvailableNow
  * with a temp checkpoint, waits for the drain, and registers the sink view
  * with [[graft.CacheScope]] so the runner's per-query release drops the
  * drained rows from driver memory (per-row sinks would otherwise pin the
  * whole stream for the session's lifetime).
  */
object StreamHarness {

  private val ShuffleKey = "spark.sql.shuffle.partitions"
  private val StoreKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Pin the shuffle-partition count (= the state-store partition count
    * frozen into a NEW checkpoint) for the duration of `start`. Safe to
    * restore right after: the stream clones the session conf synchronously
    * inside start(). Stateful streaming queries that start their own sink
    * (rather than through [[runToMemory]]) use this so their state store is
    * sized to the KEY CARDINALITY instead of the session default — every
    * micro-batch pays one state commit per partition, so a handful-of-keys
    * aggregation on a 32-partition store pays 32 commits a batch for state
    * that fits in one (measured on q352: 5 epochs x 32 commits was ~2 s of
    * pure commit overhead; optimization guide §2 — size from the data, not
    * from the core count).
    */
  def withStatePartitions[T](s: SparkSession, statePartitions: Int)(start: => T): T = {
    val prev = s.conf.get(ShuffleKey)
    s.conf.set(ShuffleKey, statePartitions.toString)
    try start finally s.conf.set(ShuffleKey, prev)
  }

  /** Drain `build`'s streaming plan to a memory sink and return it as a
    * (lazy) DataFrame. `statePartitions` sizes the state store to the key
    * cardinality — each micro-batch pays one state commit per partition, so
    * small state wants far fewer than the session's shuffle default.
    * `rocksdb` selects the RocksDB provider (required by transformWithState
    * for column families).
    */
  /** With `failOnLateDrop` (the default), a drained query that silently
    * dropped rows at the watermark ABORTS instead of returning a plausible
    * wrong answer: every engine-streaming oracle query's fixture is produced
    * so nothing is ever late, so a nonzero drop count means the fixture's
    * order/watermark discipline broke (round-4 advice: q139's 0 s watermark
    * depends on cross-batch event-time order — make disorder fail loudly).
    * q144, which oracle-checks the drop semantics themselves, opts out.
    */
  def runToMemory(s: SparkSession, prefix: String, statePartitions: Int,
      mode: String = "append", rocksdb: Boolean = false,
      failOnLateDrop: Boolean = true)
      (build: => DataFrame): DataFrame = {
    val sinkName = s"${prefix}_sink_${System.nanoTime()}"
    val prevStore = s.conf.getOption(StoreKey)
    if (rocksdb) s.conf.set(StoreKey, RocksDb)
    val q = try {
      withStatePartitions(s, statePartitions) {
        build.writeStream.outputMode(mode)
          .format("memory").queryName(sinkName)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"graft-$prefix-ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
      }
    } finally {
      prevStore match {
        case Some(v) => s.conf.set(StoreKey, v)
        case None => s.conf.unset(StoreKey)
      }
    }
    // register before waiting: a query that fails mid-drain must still get
    // its partially filled sink dropped at the next release
    graft.CacheScope.sinkView(s, sinkName)
    q.awaitTermination()
    if (failOnLateDrop) {
      val dropped = q.recentProgress.iterator
        .flatMap(p => Option(p.stateOperators).iterator.flatten)
        .map(_.numRowsDroppedByWatermark)
        .sum
      require(dropped == 0L,
        s"$prefix dropped $dropped late rows at the watermark — the fixture's " +
          "event-time order or watermark delay no longer covers its disorder")
    }
    s.table(sinkName)
  }
}
