package graft

import graft.log.LogWriter
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Streaming analytics over the graftlog source: watermarked windows,
  * streaming dedup, stream-stream interval join, per-key arbitrary state.
  */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkLog(stream: String, entries: Seq[(Long, Map[String, Any])]): String = {
    val root = TestSpark.tmpDir("slog")
    var now = 0L
    val w = new LogWriter(root, stream, () => now)
    entries.foreach { case (ts, values) => now = ts; w.produce(values) }
    root
  }

  private def readLog(root: String, stream: String): DataFrame =
    spark.readStream.format("graftlog")
      .option("path", root).option("stream", stream)
      .option("startingOffsets", "earliest").load()

  private def runToMemory(df: DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .option("checkpointLocation", TestSpark.tmpDir("ckpt")).start()
    q.processAllAvailable()
    q.stop()
  }

  private val H = 3600L * 1000L // one hour of millis

  test("tumbling watermarked counts over the stream log") {
    val root = mkLog("ev", Seq(
      (1 * H + 1, Map("kind" -> "a")), (1 * H + 2, Map("kind" -> "b")),
      (2 * H + 1, Map("kind" -> "a")),
      (9 * H, Map("kind" -> "flush")))) // advances watermark past hours 1-2
    val agg = StreamingOps.tumblingCounts(readLog(root, "ev"), "ts", "1 minute", "1 hour")
    runToMemory(agg, "tumble")
    val got = spark.sql("select win.start, n from tumble order by 1").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    assert(got(1 * H) == 2L)
    assert(got(2 * H) == 1L)
  }

  test("streaming dedup within watermark drops repeated keys") {
    val root = mkLog("ev", Seq(
      (1000L, Map("user" -> "u1", "action" -> "click")),
      (2000L, Map("user" -> "u1", "action" -> "click")), // dup within horizon
      (3000L, Map("user" -> "u2", "action" -> "click"))))
    val dedup = StreamingOps.dedupWithinWatermark(
      readLog(root, "ev").selectExpr("ts", "values['user'] AS user"),
      "ts", "10 minutes", "user")
    runToMemory(dedup, "dedup")
    val users = spark.sql("select user from dedup order by user").collect().map(_.getString(0))
    assert(users.toSeq == Seq("u1", "u2"))
  }

  test("stream-stream interval join matches clicks to later purchases") {
    val root = mkLog("ev", Seq(
      (1000L, Map("et" -> "click", "user" -> "u1")),
      (60 * 1000L, Map("et" -> "purchase", "user" -> "u1")),
      (10 * H, Map("et" -> "other", "user" -> "zz")))) // watermark flush
    val all = readLog(root, "ev")
      .selectExpr("ts", "values['et'] AS et", "values['user'] AS user")
    val clicks = all.filter("et = 'click'").selectExpr("user", "ts AS click_ts")
    val buys = all.filter("et = 'purchase'").selectExpr("user AS buyer", "ts AS buy_ts")
    val joined = StreamingOps.intervalJoin(
      clicks.withColumnRenamed("user", "k"), "click_ts",
      buys.withColumnRenamed("buyer", "k"), "buy_ts",
      "k", "1 minute", "5 minutes")
    runToMemory(joined.selectExpr("l.k AS user"), "ssjoin")
    val got = spark.sql("select user from ssjoin").collect().map(_.getString(0))
    assert(got.toSeq == Seq("u1"))
  }

  test("late data beyond the watermark is dropped from finalized windows") {
    val root = TestSpark.tmpDir("slog")
    var now = 0L
    val w = new LogWriter(root, "ev", () => now)
    val q = StreamingOps.tumblingCounts(readLog(root, "ev"), "ts", "1 minute", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("late")
      .option("checkpointLocation", TestSpark.tmpDir("ckpt")).start()
    // batch 1: hour-1 events, then advance event time far ahead
    now = 1 * H; w.produce(Map("k" -> "a"))
    now = 9 * H; w.produce(Map("k" -> "flush"))
    q.processAllAvailable()
    // batch 2: a straggler for hour 1, way behind the watermark (~9h)
    now = 1 * H + 1; w.produce(Map("k" -> "late"))
    now = 20 * H; w.produce(Map("k" -> "flush2"))
    q.processAllAvailable()
    q.stop()
    val hour1 = spark.sql(s"select n from late where win.start = to_timestamp(${1 * H / 1000})")
      .collect().map(_.getLong(0)).toList
    assert(hour1 == List(1L)) // the late event did not reopen the window
  }

  test("stream-static broadcast enrichment join") {
    import spark.implicits._
    val root = mkLog("ev", Seq(
      (1000L, Map("user" -> "u1")), (2000L, Map("user" -> "u2"))))
    val dim = Seq(("u1", "gold"), ("u2", "basic")).toDF("user", "tier")
    val joined = StreamingOps.enrichWithStatic(
      readLog(root, "ev").selectExpr("values['user'] AS user"), dim, "user")
    runToMemory(joined, "enrich")
    val got = spark.sql("select user, tier from enrich order by user").collect()
      .map(r => r.getString(0) -> r.getString(1)).toList
    assert(got == List("u1" -> "gold", "u2" -> "basic"))
  }

  test("per-key running state via transformWithState (typed ValueState)") {
    val root = mkLog("ev", Seq(
      (1000L, Map("k" -> "a", "v" -> "1")),
      (2000L, Map("k" -> "a", "v" -> "2")),
      (3000L, Map("k" -> "b", "v" -> "9"))))
    // transformWithState needs the RocksDB store (column families)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val state = StreamingOps.runningCountByKeyTws(spark,
        readLog(root, "ev").selectExpr("values['k'] AS k", "values['v'] AS v"),
        "k", "v")
      runToMemory(state.toDF("key", "n", "last"), "tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.sql("select key, n, last from tws order by key, n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    assert(got == List(("a", 1L, "1"), ("a", 2L, "2"), ("b", 1L, "9")))
  }

  test("per-(key, bucket) running counts via transformWithState MapState") {
    // two batches (maxEntriesPerTrigger=3) so map entries must survive a
    // micro-batch boundary: key a bucket 1 reaches 3 across the split,
    // bucket 2 stays at 1, key b bucket 1 is independent of a's
    val root = mkLog("ev", Seq(
      (1000L, Map("k" -> "a", "b" -> 1L)),
      (2000L, Map("k" -> "a", "b" -> 2L)),
      (3000L, Map("k" -> "a", "b" -> 1L)),
      (4000L, Map("k" -> "b", "b" -> 1L)),
      (5000L, Map("k" -> "a", "b" -> 1L))))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "3").load()
        .selectExpr("values['k'] AS k", "values['b'] AS b")
      val counts = StreamingOps.bucketCountsByKeyTws(spark, src, "k", "b")
      runToMemory(counts.toDF("key", "bucket", "n"), "mapstate")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.sql("select key, bucket, n from mapstate order by key, bucket, n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(("a", 1L, 1L), ("a", 1L, 2L), ("a", 1L, 3L),
      ("a", 2L, 1L), ("b", 1L, 1L)))
  }

  test("streaming LOCF carries the last observation across micro-batch boundaries") {
    // maxEntriesPerTrigger=2 → batches [1,2] [3,4] [5]: id 3 (missing) must
    // inherit id 2's value FROM STATE (prior batch), id 5 (missing) must
    // inherit id 4's across another boundary; key b never observes → -1.
    val M = Long.MinValue
    val root = mkLog("ev", Seq(
      (1000L, Map("k" -> "a", "seq" -> 1L, "obs" -> M)),
      (2000L, Map("k" -> "a", "seq" -> 2L, "obs" -> 70L)),
      (3000L, Map("k" -> "a", "seq" -> 3L, "obs" -> M)),
      (4000L, Map("k" -> "a", "seq" -> 4L, "obs" -> 80L)),
      (5000L, Map("k" -> "b", "seq" -> 5L, "obs" -> M))))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "2").load()
        .selectExpr("values['k'] AS k", "CAST(values['seq'] AS BIGINT) AS seq",
          "CAST(values['obs'] AS BIGINT) AS obs")
      val filled = StreamingOps.forwardFillByKeyTws(spark, src, "k", "seq", "obs")
      runToMemory(filled.toDF("key", "seq", "filled"), "locf")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.sql("select key, seq, filled from locf order by seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(("a", 1L, -1L), ("a", 2L, 70L), ("a", 3L, 70L),
      ("a", 4L, 80L), ("b", 5L, -1L)))
  }

  test("streaming anomaly flags judge against pre-event state across batches") {
    // 6 flat readings then a wild one, split into 3 batches: the wild
    // value (seq 7) must flag against the flat history held in state, and
    // the flat readings must not flag (warm-up -1 for the first minN=5).
    val root = mkLog("ev", (1L to 6L).map(i =>
      (i * 1000L, Map[String, Any]("k" -> "a", "seq" -> i, "v" -> (50L + i % 2)))) :+
      (7000L, Map[String, Any]("k" -> "a", "seq" -> 7L, "v" -> 5000L)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "3").load()
        .selectExpr("values['k'] AS k", "CAST(values['seq'] AS BIGINT) AS seq",
          "CAST(values['v'] AS BIGINT) AS v")
      val flags = StreamingOps.anomalyFlagsByKeyTws(spark, src, "k", "seq", "v", 5L)
      runToMemory(flags.toDF("key", "seq", "v", "flag"), "anom")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.sql("select seq, flag from anom order by seq")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(got == List((1L, -1), (2L, -1), (3L, -1), (4L, -1), (5L, -1),
      (6L, 0), (7L, 1)))
  }

  test("per-key bounded history via transformWithState ListState") {
    // maxEntriesPerTrigger=3 → batches [1,2,3] and [4,5]: id 4's history
    // must come from state built in batch one, and the n=3 cap must have
    // evicted id 1 by the time id 5 arrives
    val root = mkLog("ev", Seq(
      (1000L, Map("k" -> "a", "id" -> 1L)),
      (2000L, Map("k" -> "a", "id" -> 2L)),
      (3000L, Map("k" -> "a", "id" -> 3L)),
      (4000L, Map("k" -> "a", "id" -> 4L)),
      (5000L, Map("k" -> "a", "id" -> 5L))))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "3").load()
        .selectExpr("values['k'] AS k", "values['id'] AS id")
      val hist = StreamingOps.recentIdsByKeyTws(spark, src, "k", "id", 3)
      runToMemory(hist.toDF("key", "id", "recent"), "liststate")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.sql("select id, recent from liststate order by id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(got == List(1L -> "", 2L -> "1", 3L -> "1,2",
      4L -> "1,2,3", 5L -> "2,3,4"))
  }

  test("per-key running state via flatMapGroupsWithState") {
    val root = mkLog("ev", Seq(
      (1000L, Map("k" -> "a", "v" -> "1")),
      (2000L, Map("k" -> "a", "v" -> "2")),
      (3000L, Map("k" -> "b", "v" -> "9"))))
    val state = StreamingOps.runningCountByKey(spark,
      readLog(root, "ev").selectExpr("values['k'] AS k", "values['v'] AS v"),
      "k", "v")
    runToMemory(state.toDF("key", "n", "last"), "stateful")
    val got = spark.sql("select key, n, last from stateful order by key, n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    assert(got == List(("a", 1L, "1"), ("a", 2L, "2"), ("b", 1L, "9")))
  }

  test("minSeenCollisions flags later ids per key, in-batch and cross-batch") {
    // ids arrive ascending; maxEntriesPerTrigger=3 splits them into
    // [5B, 10A, 20A] and [30C, 31C, 40A]: 20 collides in-batch with 10,
    // 31 in-batch with 30, and 40 against keyA state from batch one.
    val root = mkLog("ev", Seq(
      (1000L, Map("k" -> "B", "id" -> 5L)),
      (2000L, Map("k" -> "A", "id" -> 10L)),
      (3000L, Map("k" -> "A", "id" -> 20L)),
      (4000L, Map("k" -> "C", "id" -> 30L)),
      (5000L, Map("k" -> "C", "id" -> 31L)),
      (6000L, Map("k" -> "A", "id" -> 40L))))
    val src = spark.readStream.format("graftlog")
      .option("path", root).option("stream", "ev")
      .option("startingOffsets", "earliest")
      .option("maxEntriesPerTrigger", "3").load()
      .selectExpr("values['k'] AS k", "values['id'] AS id")
    val flagged = StreamingOps.minSeenCollisions(spark, src, "k", "id")
    runToMemory(flagged.toDF("id", "hit"), "collisions")
    val got = spark.sql("select id, hit from collisions order by id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toList
    assert(got == List(5L -> false, 10L -> false, 20L -> true,
      30L -> false, 31L -> true, 40L -> true))
  }

  test("watermarkedBandCollisions emits identical verdicts for any arrival order") {
    // Same log CONTENT in three arrival orders (ascending, descending,
    // interleaved); the watermark-finalized operator must emit identical
    // verdicts for all three — the property the round-4 verdict flagged as
    // missing from emit-on-collision (q120's old state shape).
    val entries = Seq(("A", 10L), ("A", 20L), ("B", 5L), ("C", 30L),
      ("C", 31L), ("A", 40L), ("D", 50L))
    // hit iff some smaller id shares the key
    val expected = Map(10L -> false, 20L -> true, 5L -> false, 30L -> false,
      31L -> true, 40L -> true, 50L -> false)
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(storeKey)
    spark.conf.set(storeKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(order: Seq[(String, Long)], sink: String): Map[Long, Boolean] = {
        val root = TestSpark.tmpDir("slog")
        var now = 0L
        val w = new LogWriter(root, "ev", () => now)
        order.zipWithIndex.foreach { case ((k, id), i) =>
          now = (i + 1) * 1000L
          w.produce(Map("k" -> k, "id" -> id))
        }
        now += 1000L
        w.produce(Map("k" -> "Z", "id" -> 1000000L)) // watermark sentinel
        val src = spark.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "3") // several batches per run
          .load()
          .selectExpr("values['k'] AS k", "CAST(values['id'] AS BIGINT) AS id")
          .withColumn("ets", org.apache.spark.sql.functions.timestamp_seconds(
            org.apache.spark.sql.functions.col("id")))
          .withWatermark("ets", "1 day") // allowed disorder >> the shuffle span
        runToMemory(StreamingOps
          .watermarkedBandCollisions(spark, src, "k", "id", "ets")
          .toDF("id", "hit"), sink)
        spark.sql(s"select id, hit from $sink where id < 1000000").collect()
          .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      }
      val asc = run(entries.sortBy(_._2), "wmc_asc")
      val desc = run(entries.sortBy(-_._2), "wmc_desc")
      val mixed = run(Seq(entries(3), entries(5), entries(0), entries(6),
        entries(2), entries(4), entries(1)), "wmc_mixed")
      assert(asc == expected, s"ascending order diverged: $asc")
      assert(desc == expected, s"descending order diverged: $desc")
      assert(mixed == expected, s"interleaved order diverged: $mixed")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(storeKey, v)
        case None => spark.conf.unset(storeKey)
      }
    }
  }

  test("event-time-timer sessionization: in-batch close, cross-batch state, timer flush") {
    // key a: two events 1 s apart (one session), then one 11+ min later
    // (closes session 1 in-batch, opens session 2); key b: one event.
    // Sessions 2 and b stay open at the end of batch one — only the
    // event-time TIMER (fired once a later batch's flush row advances the
    // watermark) can emit them.
    val root = TestSpark.tmpDir("slog")
    var now = 0L
    val w = new LogWriter(root, "ev", () => now)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest").load()
        .selectExpr("ts", "values['k'] AS k")
        .withWatermark("ts", "0 seconds")
      val sessions = StreamingOps
        .sessionizeWithTimers(spark, src, "k", "ts", 600L * 1000 * 1000) // 10 min gap
        .toDF("key", "start_us", "end_us", "n")
      val q = sessions.writeStream.outputMode("append").format("memory")
        .queryName("timersess")
        .option("checkpointLocation", TestSpark.tmpDir("ckpt")).start()
      now = 1000L; w.produce(Map("k" -> "a"))
      now = 2000L; w.produce(Map("k" -> "a"))
      now = 700 * 1000L; w.produce(Map("k" -> "a")) // 11.6 min gap: closes (1s,2s)
      now = 800 * 1000L; w.produce(Map("k" -> "b"))
      q.processAllAvailable()
      // watermark is still 800 s here; open sessions must not have emitted
      assert(spark.sql("select * from timersess").count() == 1)
      now = 10 * H; w.produce(Map("k" -> "z")) // flush: watermark -> 10 h
      q.processAllAvailable()
      now = 20 * H; w.produce(Map("k" -> "z2")) // second flush fires z's timer too
      q.processAllAvailable()
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val got = spark.sql(
      "select key, start_us, end_us, n from timersess where key in ('a','b') order by key, start_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List(
      ("a", 1000000L, 2000000L, 2L),
      ("a", 700000000L, 700000000L, 1L),
      ("b", 800000000L, 800000000L, 1L)))
  }

  test("cepMatchesByKeyTws matches patterns across micro-batch boundaries") {
    // maxEntriesPerTrigger=2 → batches [1,2][3,4][5,6][7]. u1's purchase
    // (seq 3, batch 2) must see the click held in state from batch 1 and
    // match; the error at seq 4 invalidates the click so the purchase at
    // seq 5 must NOT match; a fresh click + purchase (6, 7) matches again.
    // Window 10s; the purchase at seq 7 arrives 1s after its click.
    val root = mkLog("ev", Seq(
      (1000L, Map("u" -> "u1", "id" -> 1L, "us" -> 1000000L, "et" -> "click")),
      (2000L, Map("u" -> "u2", "id" -> 2L, "us" -> 2000000L, "et" -> "view")),
      (3000L, Map("u" -> "u1", "id" -> 3L, "us" -> 3000000L, "et" -> "purchase")),
      (4000L, Map("u" -> "u1", "id" -> 4L, "us" -> 4000000L, "et" -> "error")),
      (5000L, Map("u" -> "u1", "id" -> 5L, "us" -> 5000000L, "et" -> "purchase")),
      (6000L, Map("u" -> "u1", "id" -> 6L, "us" -> 6000000L, "et" -> "click")),
      (7000L, Map("u" -> "u1", "id" -> 7L, "us" -> 7000000L, "et" -> "purchase"))))
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(storeKey)
    spark.conf.set(storeKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "2").load()
        .selectExpr("values['u'] AS u", "CAST(values['id'] AS BIGINT) AS id",
          "CAST(values['us'] AS BIGINT) AS us", "values['et'] AS et")
      val m = StreamingOps.cepMatchesByKeyTws(spark, src, "u", "id", "us",
        "et", 10000000L)
      runToMemory(m.toDF("user_id", "match_id", "gap_us"), "cep")
      val got = spark.sql(
          "select user_id, match_id, gap_us from cep order by match_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      assert(got == List(("u1", 3L, 2000000L), ("u1", 7L, 1000000L)))
    } finally prev match {
      case Some(v) => spark.conf.set(storeKey, v)
      case None => spark.conf.unset(storeKey)
    }
  }

  test("funnelByUserTws advances stages across micro-batch boundaries") {
    // maxEntriesPerTrigger=2 → batches [1,2][3,4][5,6][7]. u1's purchase
    // (batch 2) must find stage-2 state from batch 1; u2's pre-view click
    // is a no-op, the equal-timestamp click must NOT count (strict >), and
    // only the final click advances u2 to stage 2.
    val root = mkLog("ev", Seq(
      (1000L, Map("u" -> "u1", "tsu" -> 1000000L, "et" -> "view", "id" -> 1L)),
      (2000L, Map("u" -> "u1", "tsu" -> 2000000L, "et" -> "click", "id" -> 2L)),
      (3000L, Map("u" -> "u1", "tsu" -> 3000000L, "et" -> "purchase", "id" -> 3L)),
      (4000L, Map("u" -> "u2", "tsu" -> 4000000L, "et" -> "click", "id" -> 4L)),
      (5000L, Map("u" -> "u2", "tsu" -> 5000000L, "et" -> "view", "id" -> 5L)),
      (6000L, Map("u" -> "u2", "tsu" -> 5000000L, "et" -> "click", "id" -> 6L)),
      (7000L, Map("u" -> "u2", "tsu" -> 7000000L, "et" -> "click", "id" -> 7L))))
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(storeKey)
    spark.conf.set(storeKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", "2").load()
        .selectExpr("values['u'] AS u", "values['tsu'] AS tsu",
          "values['et'] AS et", "values['id'] AS id")
      val fin = StreamingOps.funnelByUserTws(spark, src, "u", "tsu", "et", "id",
        Seq("view", "click", "purchase"))
      runToMemory(fin.toDF("user_id", "stage"), "funnel")
      val got = spark.sql("select user_id, stage from funnel order by user_id, stage")
        .collect().map(r => (r.getString(0), r.getInt(1))).toList
      assert(got == List(("u1", 1), ("u1", 2), ("u1", 3), ("u2", 1), ("u2", 2)))
    } finally prev match {
      case Some(v) => spark.conf.set(storeKey, v)
      case None => spark.conf.unset(storeKey)
    }
  }
}
