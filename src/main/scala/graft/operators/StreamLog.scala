package graft.operators

import graft.QueryDef.q
import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** Oracle-checked exercise of the engine's own stream log (SURVEY.md §2A):
  * `produce` (batch sink with driver-assigned `"<millis>-<seq>"` ids and
  * to_string value coercion, ≙ /root/reference/lib/stream.ex:25-38) followed
  * by a positioned scan (DataSource V2 batch read). The payload round-trips
  * through the schemaless MAP<STRING,STRING> model, and the oracle asserts
  * the coerced values match DuckDB's own string rendering of the source
  * table — proving the coercion rule, not just the plumbing.
  */
object StreamLog {

  /** Shared event-time log (memoized per sfDir): events bulk-produced with
    * explicit timestamps, making the ids' millisecond prefixes event
    * milliseconds — the fixture behind both time-based replay (q131) and
    * the batch time-slice scan (q132). Built through
    * [[graft.log.LogBulkProducer]]: ids are data-derived and executors
    * publish their own segments, so no row passes through the driver (the
    * previous collect-then-produceAllAt materialized all events on one
    * node — a 10M-row driver sort at 100× this scale).
    */
  private def eventTimeLog(s: SparkSession, dir: String): String = {
    import s.implicits._
    graft.LogFixtures.producedLog(dir, "q131") { r =>
      graft.log.LogBulkProducer.produceAt(
        Tables.load(s, dir, "events")
          .select(unix_millis($"ts").as("ms"), $"event_type"),
        "ms", r, "ev", orderCols = Seq("event_type"))
    }
  }

  /** Shared clicks/purchases log pair (memoized per sfDir) behind the
    * stream-stream join family (q107 inner, q242 left-semi): the events
    * table split into two engine streams, timestamps carried as
    * microsecond strings through the schemaless payload.
    */
  private def clickPurchaseLog(s: SparkSession, dir: String): String = {
    import s.implicits._
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    graft.LogFixtures.producedLog(dir, "q107") { r =>
      def sink(eventType: String, stream: String): Unit =
        Tables.load(s, dir, "events")
          .filter($"event_type" === eventType)
          .selectExpr("CAST(user_id AS STRING) AS user_id",
            s"date_format(ts, '$tsFmt') AS ts_s")
          .write.format("graftlog")
          .option("path", r).option("stream", stream)
          .mode("append").save()
      sink("click", "clicks")
      sink("purchase", "purchases")
    }
  }

  /** Shared (user_id, event_type) log (memoized per sfDir) behind the
    * stream-static join family (q105 inner enrichment, q245 anti
    * blocklist): the events table as one engine stream.
    */
  private def userEventLog(s: SparkSession, dir: String): String =
    graft.LogFixtures.producedLog(dir, "q105") { r =>
      Tables.load(s, dir, "events")
        .selectExpr("CAST(user_id AS STRING) AS user_id", "event_type")
        .write.format("graftlog")
        .option("path", r).option("stream", "ev")
        .mode("append").save()
    }

  /** 12 h past the stream's first event — the cutoff q131/q132 replay from.
    * Memoized per sfDir: one single-column min-scan per JVM instead of 4+
    * redundant jobs per bench invocation of either query.
    */
  private val cutoffCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def cutoffMs(s: SparkSession, dir: String): Long = {
    import s.implicits._
    cutoffCache.computeIfAbsent(dir, _ =>
      Tables.load(s, dir, "events")
        .agg(min(unix_millis($"ts"))).head().getLong(0) + 43200000L)
  }

  /** Scale-adaptive micro-batch caps for streams carrying the FULL events
    * table (optimization guide §2: derive sizing from the input, never a
    * constant tuned for one SF). A fixed 8000-entry cap that meant 2
    * micro-batches at the sf0.01 gate degenerated to 13 batches at sf0.1 —
    * each paying the fixed per-batch commit floor (the q352 pathology,
    * round-9) — for results that are batch-count-invariant complete-mode
    * aggregations. `twoBatchCap` drains in 2 batches at any SF ≥ 0.01
    * (state still crosses a batch boundary); `severalBatchCap` keeps the
    * multi-commit exercise the replication pipes document, at 4 batches.
    * Floors keep the sf0.001 gate's batch counts as they were.
    */
  private def twoBatchCap(s: SparkSession, dir: String): String =
    Tables.twoBatchCap(s, dir)
  private def severalBatchCap(s: SparkSession, dir: String): String =
    Tables.severalBatchCap(s, dir)

  val defs: Seq[QueryDef] = Seq(

    q("q158_schema_on_read",
      // Schema-on-read projection on the log source (SURVEY §1.4): the
      // payload stays schemaless on the wire (to_string coercion,
      // /root/reference/lib/stream.ex:15-16), but a consumer that declares
      // `valueSchema` gets typed, pruned columns parsed straight out of the
      // payload — no MapType ever materializes in the rows, and unprojected
      // keys are never touched. The oracle is the original typed table:
      // to_string round-trips every supported type exactly (Java shortest-
      // roundtrip double rendering included), so the typed read-back must
      // hash-match the source rows bit for bit.
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      val root = graft.LogFixtures.producedLog(dir, "q158") { r =>
        Tables.load(s, dir, "events")
          .select($"event_id", $"user_id", $"event_type", $"value")
          .write.format("graftlog")
          .option("path", r).option("stream", "ev")
          .mode("append").save()
      }
      s.read.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("valueSchema",
          "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .load()
        .select($"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"event_id")
    },

    q("q60_log_roundtrip",
      """SELECT CAST(event_id AS VARCHAR) AS event_id_s,
        |  event_type AS event_type_s,
        |  CAST(value AS VARCHAR) AS value_s
        |FROM events ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      val root = graft.TempDirs.scratch("graft-q60")
      Tables.load(s, dir, "events")
        .select($"event_id", $"event_type", $"value")
        .write.format("graftlog")
        .option("path", root).option("stream", "events")
        .mode("append").save()
      s.read.format("graftlog")
        .option("path", root).option("stream", "events")
        .load()
        .select(
          element_at($"values", "event_id").as("event_id_s"),
          element_at($"values", "event_type").as("event_type_s"),
          element_at($"values", "value").as("value_s"))
        .orderBy($"event_id_s".cast("long"))
    },

    q("q78_streaming_agg",
      // The one oracle-checked query that executes THROUGH the streaming
      // engine: events -> log sink -> micro-batch source (AvailableNow) ->
      // windowed aggregation -> memory sink; DuckDB checks the final state
      // against plain batch SQL over the same events.
      s"""SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
         |  event_type, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""") { (s, dir) =>
      import s.implicits._
      val root = graft.LogFixtures.producedLog(dir, "q78") { r =>
        Tables.load(s, dir, "events")
          .selectExpr("CAST(event_id AS STRING) AS event_id",
            "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s", "event_type")
          .write.format("graftlog")
          .option("path", r).option("stream", "ev")
          .mode("append").save()
      }
      // Streaming-state tuning: the windowed agg's state store is hash
      // partitioned by the shuffle-partition count frozen at checkpoint
      // creation, and every micro-batch pays one state commit per partition
      // (measured: 4 batches × 8 partitions ≈ 2.2× slower than × 2). The
      // distinct-key cardinality here is tiny (hours × event_types), so 4
      // state partitions beats the session default 32 — fewer stateful tasks
      // per micro-batch, same parallelism where it matters (the source scan).
      graft.streaming.StreamHarness.runToMemory(s, "q78", 4, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          // 2 micro-batches at bench scale (sf0.1 = 100k events): state
          // still crosses a batch boundary, without paying the fixed
          // per-batch commit overhead twice more (measured ~0.5 s/batch)
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
          .select(to_timestamp($"values.ts_s").as("ets"),
            $"values.event_type".as("event_type"))
          .groupBy(window($"ets", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"))
      }
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("ws"),
          $"event_type", $"n")
        .orderBy($"ws", $"event_type")
    },

    q("q105_streaming_enrich",
      // Stream-static enrichment THROUGH the engine: events -> log sink ->
      // micro-batch source -> inner join with a static dimension (drops
      // excluded users, attaches a cohort) -> running counts. The static
      // side is broadcast into every micro-batch — the standard shape for
      // enriching a firehose with a reference table at scale (the dim is
      // small; the stream never shuffles for the join).
      """SELECT user_id % 5 AS cohort, event_type, COUNT(*) AS n
        |FROM events WHERE user_id % 3 <> 0
        |GROUP BY 1, 2 ORDER BY cohort, event_type""") { (s, dir) =>
      import s.implicits._
      val root = userEventLog(s, dir)
      // static dimension: the allow-listed users with their cohort label
      val dim = Tables.load(s, dir, "events")
        .select($"user_id").distinct()
        .filter($"user_id" % 3 =!= 0)
        .select($"user_id".cast("string").as("d_user_id"),
          ($"user_id" % 5).as("cohort"))
      // 4 state partitions: tiny state keyspace
      graft.streaming.StreamHarness.runToMemory(s, "q105", 4, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
          .select($"values.user_id".as("user_id"),
            $"values.event_type".as("event_type"))
          .join(broadcast(dim), $"user_id" === $"d_user_id") // stream-static
          .groupBy($"cohort", $"event_type")
          .agg(count(lit(1)).as("n"))
      }
        .select($"cohort", $"event_type", $"n")
        .orderBy($"cohort", $"event_type")
    },

    q("q245_streaming_anti_join",
      // Stream-static LEFT ANTI through the engine — blocklist filtering,
      // THE streaming-curation primitive (drop every event from a banned
      // user without touching the rest): the blocklist is broadcast into
      // each micro-batch and the stream never shuffles for the join; the
      // running per-type counts prove nothing blocked leaked through and
      // nothing allowed was lost. q105 is the inner (keep-listed) twin on
      // the same log.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM events b
        |  WHERE b.user_id % 3 = 0 AND b.user_id = e.user_id)
        |GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val root = userEventLog(s, dir)
      val blocklist = Tables.load(s, dir, "events")
        .select($"user_id").distinct()
        .filter($"user_id" % 3 === 0)
        .select($"user_id".cast("string").as("b_user_id"))
      graft.streaming.StreamHarness.runToMemory(s, "q245", 4, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
          .select($"values.user_id".as("user_id"),
            $"values.event_type".as("event_type"))
          .join(broadcast(blocklist), $"user_id" === $"b_user_id",
            "left_anti") // stream-static anti
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
      }
        .select($"event_type", $"n")
        .orderBy($"event_type")
    },

    q("q107_streaming_join",
      // Stream-stream join THROUGH the engine: clicks and purchases land in
      // two separate log streams; two micro-batch sources join on user
      // within a 10-minute event-time interval, with watermarks bounding
      // the join state. maxEntriesPerTrigger forces multiple micro-batches,
      // so matches MUST cross batch boundaries through the state store —
      // the oracle is the equivalent batch interval join.
      """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) cts FROM events
        |           WHERE event_type = 'click'),
        |     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) pts FROM events
        |           WHERE event_type = 'purchase')
        |SELECT c.user_id,
        |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 10 MINUTE
        |ORDER BY 1, 2, 3""") { (s, dir) =>
      import s.implicits._
      val root = clickPurchaseLog(s, dir)
      def src(stream: String, tsCol: String, userCol: String) =
        s.readStream.format("graftlog")
          .option("path", root).option("stream", stream)
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "12000") // 2 micro-batches at sf0.1
          .load()
          .select(to_timestamp($"values.ts_s").as(tsCol),
            $"values.user_id".as(userCol))
          // generous delay: the fixture's event times are out of order, and
          // a row dropped as late would silently diverge from the batch
          // oracle — correctness first, state size is tiny at this key count
          .withWatermark(tsCol, "2 hours")
      val fmt = "yyyy-MM-dd HH:mm:ss"
      // stream-stream join keeps four state stores per partition; with a
      // tiny key space, 2 partitions halves the per-batch commit cost
      graft.streaming.StreamHarness.runToMemory(s, "q107", 2) {
        src("clicks", "cts", "cu")
          .join(src("purchases", "pts", "pu"),
            expr("cu = pu AND pts >= cts AND pts < cts + INTERVAL 10 MINUTES"))
      }
        .select($"cu".cast("long").as("user_id"),
          date_format($"cts", fmt).as("click_ts"),
          date_format($"pts", fmt).as("purchase_ts"))
        .orderBy($"user_id", $"click_ts", $"purchase_ts")
    },

    q("q242_streaming_semi_join",
      // Stream-stream LEFT SEMI join through the engine — "which clicks
      // converted?" without materializing the purchase columns: each click
      // is emitted AT MOST ONCE however many qualifying purchases arrive,
      // so the output stays click-sized (the inner join q107 multiplies by
      // match count). Same watermark/state mechanics as q107 — matches
      // must cross micro-batch boundaries through the join state — and
      // the oracle is the batch EXISTS over the identical interval.
      """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) cts FROM events
        |           WHERE event_type = 'click'),
        |     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) pts FROM events
        |           WHERE event_type = 'purchase')
        |SELECT c.user_id,
        |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM c WHERE EXISTS (SELECT 1 FROM p
        |  WHERE p.user_id = c.user_id
        |    AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 10 MINUTE)
        |ORDER BY 1, 2""") { (s, dir) =>
      import s.implicits._
      val root = clickPurchaseLog(s, dir)
      def src(stream: String, tsCol: String, userCol: String) =
        s.readStream.format("graftlog")
          .option("path", root).option("stream", stream)
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "12000") // 2 micro-batches at sf0.1
          .load()
          .select(to_timestamp($"values.ts_s").as(tsCol),
            $"values.user_id".as(userCol))
          .withWatermark(tsCol, "2 hours") // q107's late-safety rationale
      val fmt = "yyyy-MM-dd HH:mm:ss"
      graft.streaming.StreamHarness.runToMemory(s, "q242", 2) {
        src("clicks", "cts", "cu")
          .join(src("purchases", "pts", "pu"),
            expr("cu = pu AND pts >= cts AND pts < cts + INTERVAL 10 MINUTES"),
            "left_semi")
      }
        .select($"cu".cast("long").as("user_id"),
          date_format($"cts", fmt).as("click_ts"))
        .orderBy($"user_id", $"click_ts")
    },

    q("q115_streaming_custom_state",
      // Arbitrary per-key state THROUGH the engine: transformWithState
      // (typed ValueState in RocksDB) assigns each event its running count
      // within its event_type, across micro-batch boundaries. The oracle
      // pins two invariants to the plain batch counts: the final running
      // value per key is the key's total (state survived the batches), and
      // exactly one output row was emitted per input (no loss, no dupes).
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val root = graft.LogFixtures.producedLog(dir, "q115") { r =>
        Tables.load(s, dir, "events")
          .selectExpr("event_type", "CAST(event_id AS STRING) AS event_id")
          .write.format("graftlog")
          .option("path", r).option("stream", "ev")
          .mode("append").save()
      }
      graft.streaming.StreamHarness.runToMemory(s, "q115", 4, rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
          .selectExpr("values['event_type'] AS k", "values['event_id'] AS v")
        graft.streaming.StreamingOps.runningCountByKeyTws(s, src, "k", "v")
          .toDF("event_type", "running", "event_id")
      }
        .groupBy($"event_type")
        .agg(max($"running").as("n_events"), count(lit(1)).as("n_rows"))
        .orderBy($"event_type")
    },

    q("q125_streaming_mapstate",
      // transformWithState MapState THROUGH the engine: per event_type
      // (the grouping key), a state MAP of user-bucket -> running count,
      // point-updated per row in RocksDB. The oracle pins the same two
      // invariants as q115, now per (key, sub-key): the final running
      // value equals the batch count (map entries survive micro-batches)
      // and one output row was emitted per input.
      """SELECT event_type, user_id % 10 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""") { (s, dir) =>
      import s.implicits._
      val root = graft.LogFixtures.producedLog(dir, "q125") { r =>
        Tables.load(s, dir, "events")
          .selectExpr("event_type", "CAST(user_id AS STRING) AS user_id")
          .write.format("graftlog")
          .option("path", r).option("stream", "ev")
          .mode("append").save()
      }
      graft.streaming.StreamHarness.runToMemory(s, "q125", 4, rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
          .selectExpr("values['event_type'] AS k",
            "CAST(values['user_id'] AS BIGINT) % 10 AS b")
        graft.streaming.StreamingOps.bucketCountsByKeyTws(s, src, "k", "b")
          .toDF("event_type", "bucket", "running")
      }
        .groupBy($"event_type", $"bucket")
        .agg(max($"running").as("n_events"), count(lit(1)).as("n_rows"))
        .orderBy($"event_type", $"bucket")
    },

    q("q159_consumer_lag",
      // Stream introspection / consumer lag (XLEN + XINFO GROUPS analog,
      // [[StreamInspect]]): two groups drain the event-time log to
      // different positions — gA all the way, gB exactly one admission-
      // controlled micro-batch of total/2 entries — and the operator
      // reports each group's committed id, the stream high-water, and the
      // lag. Ids are event-time-derived (same log as q131), so both the
      // committed ids and the lag are stated exactly over the batch events
      // table: the id at position k is (ms of the bucket containing k,
      // k - entries_before_bucket - 1).
      """WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM e),
        |k AS (SELECT total // 2 AS half FROM n),
        |b AS (SELECT ms, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY ms),
        |w AS (SELECT ms, c, SUM(c) OVER (ORDER BY ms) AS cum FROM b),
        |halfid AS (SELECT ms || '-' || CAST(kk.half - (w.cum - w.c) - 1 AS BIGINT) AS id
        |           FROM w, k kk WHERE w.cum >= kk.half AND w.cum - w.c < kk.half),
        |hwid AS (SELECT ms || '-' || CAST(c - 1 AS BIGINT) AS id
        |         FROM w, n WHERE cum = total)
        |SELECT 'gA' AS grp, 'ev' AS stream,
        |  (SELECT id FROM hwid) AS committed_id,
        |  (SELECT id FROM hwid) AS high_water, CAST(0 AS BIGINT) AS lag
        |UNION ALL
        |SELECT 'gB', 'ev', (SELECT id FROM halfid), (SELECT id FROM hwid),
        |  (SELECT total - kk.half FROM n, k kk)
        |ORDER BY grp""") { (s, dir) =>
      import s.implicits._
      val root = eventTimeLog(s, dir)
      val total = Tables.load(s, dir, "events").count()
      val src = s.readStream.format("graftlog")
        .option("path", root).option("stream", "ev")
        .option("startingOffsets", "earliest")
      // gA: full drain (its committed offset IS the high water)
      val ckptA = graft.TempDirs.scratch("graft-q159-gA")
      val qA = src.load().writeStream.format("noop")
        .option("checkpointLocation", ckptA)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { qA.awaitTermination(120000) } finally qA.stop()
      // gB: exactly ONE admission-controlled batch of total/2 entries —
      // a long processing-time trigger fires the first batch immediately
      // and the second in an hour; stop as soon as batch 0 commits
      val ckptB = graft.TempDirs.scratch("graft-q159-gB")
      val qB = src.option("maxEntriesPerTrigger", (total / 2).toString)
        .load().writeStream.format("noop")
        .option("checkpointLocation", ckptB)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 hour"))
        .start()
      try {
        val commit0 = java.nio.file.Paths.get(ckptB, "commits", "0")
        val deadline = System.currentTimeMillis() + 120000
        while (!java.nio.file.Files.exists(commit0) &&
            System.currentTimeMillis() < deadline) Thread.sleep(50)
        require(java.nio.file.Files.exists(commit0),
          "q159: gB's first micro-batch did not commit within 120s")
      } finally qB.stop()
      StreamInspect.groupLag(s, root, Seq("ev"),
          Seq(("gA", ckptA), ("gB", ckptB)))
        .orderBy($"grp")
    },

    q("q131_replay_from_time",
      // Time-based replay THROUGH the engine (startingTimestamp, §2A#12's
      // explicit-position start expressed as a timestamp): the log is
      // produced with the writer clock driven by EVENT time, so ids'
      // millisecond prefixes are event milliseconds and replay-from-T is
      // exact — the stream starts at the first entry at or after T (here
      // 12 h after stream start). The oracle is the same cutoff stated
      // relationally over the batch table.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        |WHERE epoch_ms(CAST(ts AS TIMESTAMP)) >=
        |  (SELECT epoch_ms(MIN(CAST(ts AS TIMESTAMP))) + 43200000 FROM events)
        |GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val root = eventTimeLog(s, dir)
      val startMs = cutoffMs(s, dir)
      graft.streaming.StreamHarness.runToMemory(s, "q131", 4, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingTimestamp", startMs.toString)
          .option("maxEntriesPerTrigger", "60000")
          .load()
          .groupBy($"values.event_type".as("event_type"))
          .agg(count(lit(1)).as("n"))
      }
        .orderBy($"event_type")
    },

    q("q132_batch_time_slice",
      // Batch time-slice scan over the log (§2A#12's ranged read, XRANGE
      // start..end, stated against the batch DSv2 path): both bounds of a
      // ts BETWEEN predicate push into GraftLogScanBuilder, so segment
      // planning prunes by file-name id range before any file opens —
      // at 100 TB a 6 h slice of a month-long log reads ~0.8% of segments.
      // Same event-time log as q131 (ids' ms prefixes are event millis);
      // the oracle states the identical slice over the batch events table.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
        |WHERE epoch_ms(CAST(ts AS TIMESTAMP)) >=
        |  (SELECT epoch_ms(MIN(CAST(ts AS TIMESTAMP))) + 43200000 FROM events)
        |AND epoch_ms(CAST(ts AS TIMESTAMP)) <
        |  (SELECT epoch_ms(MIN(CAST(ts AS TIMESTAMP))) + 64800000 FROM events)
        |GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val root = eventTimeLog(s, dir)
      val lo = cutoffMs(s, dir)
      s.read.format("graftlog")
        .option("path", root).option("stream", "ev")
        .load()
        .filter($"ts" >= lit(new java.sql.Timestamp(lo)) &&
          $"ts" < lit(new java.sql.Timestamp(lo + 21600000L)))
        .groupBy($"values.event_type".as("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    },

    q("q259_bootstrap_tail_seam",
      // Kappa-architecture bridge: bootstrap from a BATCH scan of the log
      // up to a cutoff, then tail the STREAM from exactly that cutoff —
      // the backfill-then-go-live pattern every log consumer runs on day
      // one. The seam must be exact: batch takes ts < T (pruned segment
      // scan, q132's path), the stream starts at the first entry at or
      // after T (startingTimestamp, q131's path), and the oracle pins
      // BOTH sides plus their sum against the batch table — one row
      // duplicated or dropped at the boundary and the totals hash-fail.
      """WITH cut AS (SELECT epoch_ms(MIN(CAST(ts AS TIMESTAMP))) + 43200000 c
        |  FROM events),
        |e AS (SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) ms
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN ms < cut.c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_batch,
        |  CAST(SUM(CASE WHEN ms >= cut.c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stream,
        |  CAST(COUNT(*) AS BIGINT) AS n_total
        |FROM e, cut GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val root = eventTimeLog(s, dir)
      val cut = cutoffMs(s, dir)
      val batch = s.read.format("graftlog")
        .option("path", root).option("stream", "ev")
        .load()
        .filter($"ts" < lit(new java.sql.Timestamp(cut)))
        .groupBy($"values.event_type".as("event_type"))
        .agg(count(lit(1)).as("n_batch"))
      val tail = graft.streaming.StreamHarness.runToMemory(
          s, "q259", 4, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingTimestamp", cut.toString)
          .option("maxEntriesPerTrigger", "60000")
          .load()
          .groupBy($"values.event_type".as("event_type"))
          .agg(count(lit(1)).as("n_stream"))
      }
      batch.join(tail, Seq("event_type"), "full_outer")
        .select($"event_type",
          coalesce($"n_batch", lit(0L)).as("n_batch"),
          coalesce($"n_stream", lit(0L)).as("n_stream"))
        .withColumn("n_total", $"n_batch" + $"n_stream")
        .orderBy($"event_type")
    },

    q("q128_streaming_liststate",
      // transformWithState ListState THROUGH the engine — the third typed
      // state primitive (q115 ValueState, q125 MapState): per event_type,
      // a bounded list of the 3 most recent event_ids; each event emits
      // the history as it stood before it arrived. State is capped at 3
      // longs per key by construction. The oracle is the batch window
      // frame ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING over the same
      // arrival (= event_id) order.
      """SELECT event_type, event_id,
        |  COALESCE(string_agg(CAST(event_id AS VARCHAR), ',') OVER (
        |    PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '') AS recent
        |FROM events ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      // produce in event_id order: the first-seen semantics are defined
      // over arrival order, as in q120
      val root = graft.LogFixtures.producedLog(dir, "q128") { r =>
        Tables.load(s, dir, "events")
          .selectExpr("event_type", "CAST(event_id AS STRING) AS event_id")
          .orderBy($"event_id".cast("long"))
          .write.format("graftlog")
          .option("path", r).option("stream", "ev")
          .mode("append").save()
      }
      graft.streaming.StreamHarness.runToMemory(s, "q128", 4, rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
          .selectExpr("values['event_type'] AS k", "values['event_id'] AS id")
        graft.streaming.StreamingOps.recentIdsByKeyTws(s, src, "k", "id", 3)
          .toDF("event_type", "event_id", "recent")
      }
        .select($"event_type", $"event_id".cast("long").as("event_id"), $"recent")
        .orderBy($"event_id")
    },

    q("q120_streaming_lsh_dedup",
      // Streaming near-dup detection THROUGH the engine, ORDER-ROBUST:
      // each document is minhashed and banded map-side; per band signature
      // the state store keeps the running minimum doc_id plus the docs the
      // watermark has not yet finalized. A doc's verdict — some band saw a
      // smaller doc_id — is emitted only when the watermark passes its
      // event time (strictly monotone in doc_id), so the output is a pure
      // function of the log CONTENT: any arrival order within the
      // watermark delay gives identical results (round-4 verdict: the old
      // emit-on-collision output depended on arrival order, which no one
      // can keep at scale). One sentinel row past every real event time
      // advances the watermark so the tail finalizes. The batch oracle
      // states the same rule relationally: doc b is a dup iff an a < b
      // shares a band. Long-run state per band is one long + a
      // watermark-bounded pending buffer.
      s"""WITH words AS (SELECT doc_id, string_split(text,' ') w FROM documents),
         |sh AS (SELECT doc_id, ${graft.functions.TextHash.duckShingles("w")} shingles
         |       FROM words WHERE len(w) >= 3),
         |hs AS (SELECT doc_id, ${graft.functions.TextHash.duckHashedSet("shingles")} hh FROM sh),
         |sig AS (SELECT doc_id, ${graft.functions.TextHash.duckMinhash("hh")} mh FROM hs),
         |bands AS (SELECT doc_id, b.band,
         |    mh[CAST(b.band*4+1 AS INT)]||':'||mh[CAST(b.band*4+2 AS INT)]||':'||
         |    mh[CAST(b.band*4+3 AS INT)]||':'||mh[CAST(b.band*4+4 AS INT)] AS key
         |  FROM sig, (SELECT unnest(range(${graft.functions.TextHash.MinhashBands})) AS band) b),
         |dup AS (SELECT DISTINCT b.doc_id FROM bands a
         |        JOIN bands b ON a.band = b.band AND a.key = b.key
         |                    AND a.doc_id < b.doc_id)
         |SELECT doc_id, doc_id IN (SELECT doc_id FROM dup) AS is_dup
         |FROM sig ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      // the sentinel's event time (seconds = doc_id) exceeds every real
      // doc's by far more than the watermark delay, so the last batch
      // advances the watermark past the whole corpus and the trailing
      // no-data batches fire every remaining finalization timer
      val SentinelId = 200000L
      val root = graft.LogFixtures.producedLog(dir, "q120") { r =>
        // id order is merely a convenient produce order now — correctness
        // no longer depends on it (StreamingOpsSpec shuffles it). Bulk
        // produce through the rolled-segment path: ms is a monotone map of
        // doc_id, so ids, order, and trigger-cap batch boundaries are
        // identical to the old sequential appends — but each micro-batch's
        // id range now spans ~8 segments instead of 1, so the minhash map
        // leg reads in parallel instead of one task per batch (the
        // round-11 attempt pre-dated the meta-state processor and the
        // cached-plan AQE change; re-measured 2.9 -> 2.4 s at sf0.1).
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id".cast("string").as("doc_id"), $"text")
          .unionAll(s.range(1).selectExpr(s"'$SentinelId' AS doc_id",
            "'watermark advance sentinel row' AS text"))
          .withColumn("ms", lit(1700000000000L) + $"doc_id".cast("long"))
        graft.log.LogBulkProducer.produceAt(docs, "ms", r, "docs",
          orderCols = Seq("doc_id"))
      }
      graft.streaming.StreamHarness.runToMemory(s, "q120", 4, rocksdb = true) {
        val banded = s.readStream.format("graftlog")
          .option("path", root).option("stream", "docs")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "3000") // 5000 docs at sf0.1 -> 2 batches
          .load()
          .selectExpr("CAST(values['doc_id'] AS BIGINT) AS doc_id",
            "values['text'] AS text")
          // event time strictly monotone in doc_id: finalization order =
          // verdict order; 10 min of allowed arrival disorder — small
          // enough that the pending buffer DRAINS MID-STREAM as the
          // watermark advances (a delay past the whole corpus would hold
          // every band pending until the sentinel, growing state to corpus
          // size). The +1 keeps doc_id 0 ABOVE the initial zero watermark —
          // rows at exactly the watermark are dropped as late (epoch-0
          // event times are the degenerate case the late-drop guard in
          // StreamHarness caught)
          .withColumn("ets", timestamp_seconds($"doc_id" + 1))
          .withWatermark("ets", "600 seconds")
          .withColumn("w", split($"text", " "))
          .filter(size($"w") >= 3)
          .withColumn("hh", expr(
            s"array_distinct(transform(${graft.functions.TextHash.shinglesSql("w")}, s -> graft_polyhash(s)))"))
          .withColumn("mh", expr("graft_minhash(hh)"))
          .select($"doc_id", $"ets", explode(sequence(lit(0),
            lit(graft.functions.TextHash.MinhashBands - 1))).as("band"), $"mh")
          .withColumn("bkey", expr(
            "concat(CAST(band AS STRING), ':', concat_ws(':', transform(slice(mh, band*4 + 1, 4), x -> CAST(x AS STRING))))"))
        graft.streaming.StreamingOps
          .watermarkedBandCollisions(s, banded, "bkey", "doc_id", "ets")
          .toDF("doc_id", "hit")
      }
        .filter($"doc_id" =!= SentinelId)
        .groupBy($"doc_id")
        .agg(max($"hit").as("is_dup"))
        .orderBy($"doc_id")
    },

    q("q138_streaming_outer_join",
      // LEFT-OUTER stream-stream join THROUGH the engine: q107's interval
      // join, but clicks with no purchase within 10 minutes must ALSO emit
      // (purchase columns null) — which only happens when the engine evicts
      // the click from the join state after BOTH streams' watermarks pass
      // its match window. One sentinel row per stream (user -1, 48 h after
      // the real maximum) advances both watermarks; the trailing no-data
      // micro-batches then flush every unmatched click out of state. The
      // oracle is the equivalent batch LEFT JOIN with the unmatched side
      // canonicalized to '' (the driver comparator needs hashable columns).
      """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) cts FROM events
        |           WHERE event_type = 'click'),
        |     p AS (SELECT user_id, CAST(ts AS TIMESTAMP) pts FROM events
        |           WHERE event_type = 'purchase')
        |SELECT c.user_id,
        |  strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  COALESCE(strftime(p.pts, '%Y-%m-%d %H:%M:%S'), '') AS purchase_ts
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 10 MINUTE
        |ORDER BY 1, 2, 3""") { (s, dir) =>
      import s.implicits._
      val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val root = graft.LogFixtures.producedLog(dir, "q138") { r =>
        val ev = Tables.load(s, dir, "events")
        val sentinelMs = ev.agg(max(unix_millis($"ts"))).head().getLong(0) +
          48L * 3600 * 1000
        def sink(eventType: String, stream: String): Unit = {
          def append(df: org.apache.spark.sql.DataFrame): Unit =
            df.write.format("graftlog")
              .option("path", r).option("stream", stream)
              .mode("append").save()
          append(ev.filter($"event_type" === eventType)
            .selectExpr("CAST(user_id AS STRING) AS user_id",
              s"date_format(ts, '$tsFmt') AS ts_s"))
          // instant-exact sentinel (timestamp_millis, not Timestamp.toString:
          // the latter renders in local time and would shift on non-UTC JVMs)
          append(s.range(1).selectExpr("'-1' AS user_id",
            s"date_format(timestamp_millis($sentinelMs), '$tsFmt') AS ts_s"))
        }
        sink("click", "clicks")
        sink("purchase", "purchases")
      }
      def src(stream: String, tsCol: String, userCol: String) =
        s.readStream.format("graftlog")
          .option("path", root).option("stream", stream)
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "12000") // 2 micro-batches at sf0.1
          .load()
          .select(to_timestamp($"values.ts_s").as(tsCol),
            $"values.user_id".as(userCol))
          .withWatermark(tsCol, "2 hours") // generous: fixture ts out of order
      val fmt = "yyyy-MM-dd HH:mm:ss"
      graft.streaming.StreamHarness.runToMemory(s, "q138", 2) {
        src("clicks", "cts", "cu")
          .join(src("purchases", "pts", "pu"),
            expr("cu = pu AND pts >= cts AND pts < cts + INTERVAL 10 MINUTES"),
            "leftOuter")
      }
        .filter($"cu" =!= "-1") // drop the sentinel's self-match
        .select($"cu".cast("long").as("user_id"),
          date_format($"cts", fmt).as("click_ts"),
          coalesce(date_format($"pts", fmt), lit("")).as("purchase_ts"))
        .orderBy($"user_id", $"click_ts", $"purchase_ts")
    },

    q("q150_streaming_full_outer_join",
      // FULL-OUTER stream-stream join THROUGH the engine — completes the
      // streaming join matrix (q107 inner, q138 left-outer): unmatched rows
      // from BOTH sides must emit once both watermarks pass their match
      // windows, i.e. the engine evicts from both join-state stores. Same
      // fixture logs as q138 (memoized); the oracle is the equivalent batch
      // FULL JOIN with each unmatched side canonicalized to ''.
      """WITH c AS (SELECT user_id AS cu, CAST(ts AS TIMESTAMP) cts FROM events
        |           WHERE event_type = 'click'),
        |     p AS (SELECT user_id AS pu, CAST(ts AS TIMESTAMP) pts FROM events
        |           WHERE event_type = 'purchase')
        |SELECT COALESCE(c.cu, p.pu) AS user_id,
        |  COALESCE(strftime(c.cts, '%Y-%m-%d %H:%M:%S'), '') AS click_ts,
        |  COALESCE(strftime(p.pts, '%Y-%m-%d %H:%M:%S'), '') AS purchase_ts
        |FROM c FULL JOIN p ON c.cu = p.pu
        |  AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 10 MINUTE
        |ORDER BY 1, 2, 3""") { (s, dir) =>
      import s.implicits._
      val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val root = graft.LogFixtures.producedLog(dir, "q138") { r =>
        val ev = Tables.load(s, dir, "events")
        val sentinelMs = ev.agg(max(unix_millis($"ts"))).head().getLong(0) +
          48L * 3600 * 1000
        def sink(eventType: String, stream: String): Unit = {
          def append(df: org.apache.spark.sql.DataFrame): Unit =
            df.write.format("graftlog")
              .option("path", r).option("stream", stream)
              .mode("append").save()
          append(ev.filter($"event_type" === eventType)
            .selectExpr("CAST(user_id AS STRING) AS user_id",
              s"date_format(ts, '$tsFmt') AS ts_s"))
          append(s.range(1).selectExpr("'-1' AS user_id",
            s"date_format(timestamp_millis($sentinelMs), '$tsFmt') AS ts_s"))
        }
        sink("click", "clicks")
        sink("purchase", "purchases")
      }
      def src(stream: String, tsCol: String, userCol: String) =
        s.readStream.format("graftlog")
          .option("path", root).option("stream", stream)
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "12000") // 2 micro-batches at sf0.1
          .load()
          .select(to_timestamp($"values.ts_s").as(tsCol),
            $"values.user_id".as(userCol))
          .withWatermark(tsCol, "2 hours") // generous: fixture ts out of order
      val fmt = "yyyy-MM-dd HH:mm:ss"
      graft.streaming.StreamHarness.runToMemory(s, "q150", 2) {
        src("clicks", "cts", "cu")
          .join(src("purchases", "pts", "pu"),
            expr("cu = pu AND pts >= cts AND pts < cts + INTERVAL 10 MINUTES"),
            "fullOuter")
      }
        .filter(coalesce($"cu", $"pu") =!= "-1") // the sentinels' self-match
        .select(coalesce($"cu", $"pu").cast("long").as("user_id"),
          coalesce(date_format($"cts", fmt), lit("")).as("click_ts"),
          coalesce(date_format($"pts", fmt), lit("")).as("purchase_ts"))
        .orderBy($"user_id", $"click_ts", $"purchase_ts")
    },

    q("q139_streaming_timers",
      // EVENT-TIME TIMERS through the engine: gap-based sessionization on
      // transformWithState, where per-key arbitrary state (start, last, n)
      // is finalized by a registered timer once the watermark passes
      // last + 30 min — the engine-owned replacement for the reference's
      // handler process scheduling itself a timeout
      // (/root/reference/lib/redix/stream/consumer.ex:315-330). Unlike
      // q94's session_window (which needed one sentinel PER USER to close
      // sessions as data), ONE flush row advances the watermark and fires
      // every key's timer — the point of engine-owned timers. The oracle
      // is the batch gaps-and-islands sessionization over all events.
      """WITH t AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) uts,
        |    CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP))
        |        OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP), event_id) >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, uts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t)
        |SELECT user_id,
        |  strftime(MIN(uts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(date_diff('second', MIN(uts), MAX(uts)) AS BIGINT) AS dur_sec
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""") { (s, dir) =>
      import s.implicits._
      val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val ev = Tables.load(s, dir, "events")
      val nReal = ev.count()
      val root = graft.LogFixtures.producedLog(dir, "q139") { r =>
        def append(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("graftlog")
            .option("path", r).option("stream", "ev")
            .mode("append").save()
        // produce in EVENT-TIME order: sessions are defined over event time,
        // and ordered arrival is what lets the 0 s watermark delay hold
        // without late drops (same discipline as q120/q128's id orders)
        append(ev.orderBy($"ts", $"event_id")
          .selectExpr("CAST(user_id AS STRING) AS user_id",
            s"date_format(ts, '$tsFmt') AS ts_s"))
        val flushMs = ev.agg(max(unix_millis($"ts"))).head().getLong(0) +
          4L * 3600 * 1000
        append(s.range(1).selectExpr("'-1' AS user_id",
          s"date_format(timestamp_millis($flushMs), '$tsFmt') AS ts_s"))
      }
      val fmt = "yyyy-MM-dd HH:mm:ss"
      graft.streaming.StreamHarness.runToMemory(s, "q139", 4, rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          // reals split across 2 batches so sessions cross a state commit;
          // the flush lands in the last batch and the trailing no-data
          // batches fire the remaining timers
          .option("maxEntriesPerTrigger", (nReal / 2 + 1).toString)
          .load()
          .select(to_timestamp($"values.ts_s").as("ets"),
            $"values.user_id".as("uid"))
          .withWatermark("ets", "0 seconds")
        graft.streaming.StreamingOps
          .sessionizeWithTimers(s, src, "uid", "ets", 30L * 60 * 1000 * 1000)
          .toDF("user_id", "start_us", "end_us", "n_events")
      }
        .filter($"user_id" =!= "-1") // the flush key's own session
        .select($"user_id".cast("long").as("user_id"),
          expr("date_format(timestamp_micros(start_us), 'yyyy-MM-dd HH:mm:ss')").as("session_start"),
          $"n_events",
          expr("end_us DIV 1000000 - start_us DIV 1000000").as("dur_sec"))
        .orderBy($"user_id", $"session_start")
    },

    q("q144_late_data_drop",
      // Late-data DROP through the engine — the other half of the watermark
      // contract (every other engine-streaming query produces its fixture so
      // nothing is ever late; this one oracle-checks what the watermark
      // EXCLUDES). Two deferred sets arrive only after the on-time phase was
      // drained and its windows finalized at watermark m - 1 h (m = global
      // max event time, which stays in the on-time phase): rows with
      // event_id % 97 == 0 at least 2 h old (their hour windows closed a
      // full hour below the watermark -> DROPPED, and the run asserts the
      // engine counted them as watermark drops) and all rows in the last
      // 30 min (their windows sit above the watermark -> still MERGED,
      // proving the engine drops by window finalization, not by arrival
      // batch). Both sets sit a window away from the cut, so no engine
      // boundary convention can flip a row. The oracle aggregates exactly
      // the survivors: everything except the first set.
      """WITH x AS (SELECT date_trunc('second', CAST(ts AS TIMESTAMP)) AS tss,
        |    event_type, event_id FROM events),
        |mx AS (SELECT MAX(tss) AS m FROM x),
        |keep AS (
        |  SELECT tss, event_type FROM x, mx
        |  WHERE NOT (event_id % 97 = 0 AND tss <= m - INTERVAL 2 HOUR))
        |SELECT strftime(CAST(date_trunc('hour', tss) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, COUNT(*) AS n
        |FROM keep GROUP BY 1, 2 ORDER BY ws, event_type""") { (s, dir) =>
      import s.implicits._
      val tsFmt = "yyyy-MM-dd HH:mm:ss"
      val evRaw = Tables.load(s, dir, "events")
      // second-floored epoch keeps the watermark arithmetic exact in both
      // engines (unix_millis floors micros; div 1000 floors to the second)
      val ev = evRaw.selectExpr("event_id", "event_type",
        s"date_format(ts, '$tsFmt') AS ts_s",
        "unix_millis(ts) div 1000 AS es")
      val mS = evRaw.agg(max(unix_millis($"ts")) / lit(1000))
        .head().getDouble(0).toLong
      val isDropped = $"event_id" % 97 === 0 && $"es" <= mS - 7200
      val isLateKept = !isDropped && $"es" > mS - 1800 && $"es" < mS
      // fresh per run: the DROP depends on produce/drain interleaving, so
      // this fixture cannot be memoized like the nothing-late ones
      val root = graft.TempDirs.scratch("graft-q144")
      def append(df: org.apache.spark.sql.DataFrame): Unit =
        df.filter($"keep").orderBy($"ts_s", $"event_id")
          .select($"event_type", $"ts_s")
          .write.format("graftlog")
          .option("path", root).option("stream", "ev")
          .mode("append").save()
      append(ev.withColumn("keep", !isDropped && !isLateKept))
      val sinkName = s"q144_sink_${System.nanoTime()}"
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val q = try {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .load()
          .select(to_timestamp($"values.ts_s").as("ets"),
            $"values.event_type".as("event_type"))
          .withWatermark("ets", "1 hour")
          .groupBy(window($"ets", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .writeStream.outputMode("append")
          .format("memory").queryName(sinkName)
          .option("checkpointLocation", graft.TempDirs.scratch("graft-q144-ckpt"))
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.CacheScope.sinkView(s, sinkName)
      q.processAllAvailable() // on-time phase drains; wm -> m - 1 h; evict
      append(ev.withColumn("keep", isDropped || isLateKept))
      q.processAllAvailable() // deferred phase meets the advanced watermark
      val flushMs = (mS + 72L * 3600) * 1000
      append(s.range(1).selectExpr("CAST(0 AS BIGINT) AS event_id",
        "'__flush' AS event_type",
        s"date_format(timestamp_millis($flushMs), '$tsFmt') AS ts_s",
        "true AS keep"))
      q.processAllAvailable() // finalizes every real window
      q.stop()
      val dropped = q.recentProgress.iterator
        .flatMap(p => Option(p.stateOperators).iterator.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      // numRowsDroppedByWatermark counts what reaches the state store,
      // which is POST-partial-aggregation rows: map-side combine can merge
      // several deferred input rows into one (window, type) group before
      // the late filter sees them. The deterministic bounds are therefore
      // [distinct deferred (window, type) groups, raw deferred rows] — at
      // sf0.1 the engine lands exactly on the lower bound (full map-side
      // merge), at tiny SFs on the upper (every group a single row). The
      // row-exact exclusion contract is what the DuckDB oracle hash checks.
      val bounds = ev.filter(isDropped)
        .agg(count(lit(1)),
          countDistinct(expr("es div 3600"), $"event_type")).head()
      val (deferredRows, deferredGroups) = (bounds.getLong(0), bounds.getLong(1))
      require(dropped >= deferredGroups && dropped <= deferredRows,
        s"engine counted $dropped watermark drops; the deferred fixture set " +
          s"spans [$deferredGroups groups, $deferredRows rows] — the drop " +
          "contract regressed")
      s.table(sinkName)
        .filter($"event_type" =!= "__flush")
        .select(date_format($"w.start", tsFmt).as("ws"), $"event_type", $"n")
        .orderBy($"ws", $"event_type")
    },

    q("q145_state_inspection",
      // OFFLINE state inspection through the engine (SURVEY §2B
      // statestore/state-metadata reads, previously only spec-tested): a
      // streaming aggregation drains into a checkpoint, the query result is
      // then read NOT from the sink but from the checkpoint's state store
      // itself via the `statestore` source — the engine-side answer to
      // attaching to a live consumer and dumping its state map
      // (/root/reference/lib/redix/stream/consumer.ex:10-18). The oracle is
      // the plain batch aggregate: checkpointed state after the drain IS
      // the full group-by result, so a hash match certifies both the
      // stateful execution and the offline state read.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val root = userEventLog(s, dir)
      val ckpt = graft.TempDirs.scratch("graft-q145-ckpt")
      val sinkName = s"q145_sink_${System.nanoTime()}"
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4") // tiny state keyspace
      val q = try {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", "50000") // multi-batch at sf0.1
          .load()
          .select($"values.event_type".as("event_type"))
          .groupBy($"event_type").count()
          .writeStream.outputMode("complete")
          .format("memory").queryName(sinkName)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.CacheScope.sinkView(s, sinkName)
      q.awaitTermination()
      // sanity: the checkpoint really holds the aggregation's operator
      val ops = s.read.format("state-metadata").load(ckpt)
        .select($"operatorName").collect().map(_.getString(0)).toSet
      require(ops.contains("stateStoreSave"),
        s"checkpoint operator inventory $ops lacks the aggregation state")
      // the RESULT is read from the state store, not the sink
      s.read.format("statestore").load(ckpt)
        .select($"key.event_type".as("event_type"),
          $"value.count".as("n"))
        .orderBy($"event_type")
    },

    q("q149_retention_trim",
      // Log retention (≙ XTRIM MINID on the stream data type the reference
      // rides on): the event-time-clocked log is trimmed to the last 12 h+
      // of entries — whole segments below the cutoff are deleted without a
      // rewrite, the one straddling segment is rewritten to its suffix —
      // and the batch read over the TRIMMED log must equal the batch
      // aggregate over only the retained time range. Ids are event millis
      // (bulk produce), so the id cutoff IS the time cutoff.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(epoch_ms(CAST(ts AS TIMESTAMP))) AS BIGINT) AS first_ms
        |FROM events
        |WHERE epoch_ms(CAST(ts AS TIMESTAMP)) >=
        |  (SELECT epoch_ms(MIN(CAST(ts AS TIMESTAMP))) + 43200000 FROM events)
        |GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      // fresh log per run: trim MUTATES it (the memoized fixtures must stay
      // immutable for the other queries)
      val root = graft.TempDirs.scratch("graft-q149")
      graft.log.LogBulkProducer.produceAt(
        Tables.load(s, dir, "events")
          .select(unix_millis($"ts").as("ms"), $"event_type"),
        "ms", root, "ev", orderCols = Seq("event_type"))
      val cutoff = cutoffMs(s, dir)
      graft.log.LogStore.trim(root, "ev", graft.log.LogId.startBefore(cutoff))
      s.read.format("graftlog")
        .option("path", root).option("stream", "ev")
        .load()
        .groupBy($"values.event_type".as("event_type"))
        .agg(count(lit(1)).as("n"), min(unix_millis($"ts")).as("first_ms"))
        .orderBy($"event_type")
    },

    q("q70_csv_roundtrip",
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${graft.ColFns.dsumSql("l_quantity")} AS qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      import s.implicits._
      // source-format coverage: columnar fixture → CSV → scan with explicit
      // schema (never inferSchema at scale: it double-reads) → aggregate.
      val tmp = graft.TempDirs.scratch("graft-q70")
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("l_returnflag STRING, l_quantity DOUBLE")
        .option("header", "true").csv(tmp)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), graft.ColFns.dsum($"l_quantity").as("qty"))
        .orderBy($"l_returnflag")
    },

    q("q71_json_roundtrip",
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${graft.ColFns.dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      import s.implicits._
      val tmp = graft.TempDirs.scratch("graft-q71")
      Tables.load(s, dir, "orders")
        .select($"o_orderstatus", $"o_totalprice")
        .write.mode("overwrite").json(tmp)
      s.read.schema("o_orderstatus STRING, o_totalprice DOUBLE").json(tmp)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), graft.ColFns.dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus")
    },

    q("q182_streaming_quantiles",
      // Oracle = q179's histogram arithmetic minus the exact-truth columns:
      // the stream only ever holds the 64-bin sketch, so the sketch IS the
      // answer; the bin edges are what a monitoring dashboard reads.
      """WITH v0 AS (SELECT event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
        |b AS (SELECT CAST(MIN(vc) AS BIGINT) AS lo,
        |    CAST(MAX(vc) - MIN(vc) + 1 AS BIGINT) AS w FROM v0),
        |h AS (SELECT event_type, ((vc - lo) * 64) // w AS bin, w,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM v0, b GROUP BY event_type, ((vc - lo) * 64) // w, w),
        |cum AS (SELECT event_type, bin, c, w,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n FROM h),
        |est AS (SELECT event_type, ANY_VALUE(w) AS w,
        |    CAST(MIN(n) AS BIGINT) AS n,
        |    MIN(CASE WHEN cum * 2 >= n THEN bin END) AS b50,
        |    MIN(CASE WHEN cum * 10 >= 9 * n THEN bin END) AS b90
        |  FROM cum GROUP BY event_type)
        |SELECT event_type, n, b50,
        |  (b50 * w) // 64 AS est50_lo, ((b50 + 1) * w) // 64 - 1 AS est50_hi,
        |  b90,
        |  (b90 * w) // 64 AS est90_lo, ((b90 + 1) * w) // 64 - 1 AS est90_hi
        |FROM est ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      // q179's quantile sketch RUNNING CONTINUOUSLY through the engine —
      // the streaming shape every latency/price monitor needs: values
      // stream in from the log (integer cents, pre-derived so no float
      // ever rides the wire), the bin bounds are a STATIC one-row frame
      // broadcast into the stream (a stream-static join: in production the
      // bounds come from yesterday's batch job, exactly like this), and
      // the state per event type is the 64-counter histogram — bounded
      // regardless of stream length, the property that lets it run
      // forever. Complete-mode output; the cumulative-scan finalization
      // runs batch-side on the drained sink, the way a dashboard queries
      // the live sketch table. Multi-batch drain (4 triggers at sf0.01)
      // proves the counters accumulate across micro-batches.
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val root = graft.LogFixtures.producedLog(dir, "q182") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"vc"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val bounds = v0.agg(min($"vc").as("lo"),
        (max($"vc") - min($"vc") + 1).as("w"))
      // 2 state partitions: the keyspace is (5 types x <=64 bins); each
      // extra partition costs a state commit per micro-batch (NOTES floor)
      val sketch = graft.streaming.StreamHarness.runToMemory(
          s, "q182", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, event_type STRING, vc BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .crossJoin(broadcast(bounds))
          .select($"event_type", expr("((vc - lo) * 64) DIV w").as("bin"), $"w")
          .groupBy($"event_type", $"bin", $"w")
          .agg(count(lit(1)).as("c"))
      }
      val byType = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
      val cum = sketch
        .withColumn("cum", sum($"c").over(byType.orderBy($"bin")))
        .withColumn("n", sum($"c").over(byType))
      cum.groupBy($"event_type")
        .agg(first($"w").as("w"), min($"n").as("n"),
          min(when($"cum" * 2 >= $"n", $"bin")).as("b50"),
          min(when($"cum" * 10 >= lit(9) * $"n", $"bin")).as("b90"))
        .select($"event_type", $"n", $"b50",
          expr("(b50 * w) DIV 64").as("est50_lo"),
          expr("((b50 + 1) * w) DIV 64 - 1").as("est50_hi"),
          $"b90",
          expr("(b90 * w) DIV 64").as("est90_lo"),
          expr("((b90 + 1) * w) DIV 64 - 1").as("est90_hi"))
        .orderBy($"event_type")
    },

    q("q344_log_key_compaction", {
      val ph = graft.functions.TextHash.duckPolyHash(
        "concat_ws('|', user_id, event_id, event_type, vc)")
      // Kafka-style KEY compaction of a changelog stream
      // (LogStore.compactKeyed): per-user profile updates append in event
      // order, a tombstone batch erases every user_id % 17 == 0, and
      // compaction folds the stream to the LATEST surviving entry per key
      // — ids preserved, tombstoned keys gone, idempotent on re-run (the
      // warm path re-compacts a compacted log and must change nothing).
      // The certificate digests (user_id, event_id, event_type, vc) of
      // every retained entry, so keeping any entry but the latest — or
      // resurrecting a tombstoned key — breaks the hash. The oracle
      // derives the same latest-per-key table from events directly.
      s"""WITH u AS (SELECT user_id, event_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC)
        |      AS rn
        |  FROM events),
        |k AS (SELECT user_id, event_id, event_type, vc FROM u
        |  WHERE rn = 1 AND user_id % 17 <> 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_hash,
        |  CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |    AS BIGINT) AS sum_hash
        |FROM (SELECT $ph AS h FROM k)"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val root = graft.LogFixtures.producedLog(dir, "q344") { r =>
        // one bulk produce: updates at 1.7e12+event_id, then the tombstone
        // wave for every 17th user at 1.71e12+user_id — strictly after all
        // updates (bulk produce requires a fresh stream, so the two waves
        // ride one produce with ms encoding the order; nulls coerce to "")
        val updates = v0.select(
          (lit(1700000000000L) + $"event_id").as("ms"),
          $"user_id", $"event_id", $"event_type", $"vc",
          lit(null).cast("string").as("__deleted"))
        val tombstones = v0.select($"user_id").distinct()
          .filter($"user_id" % 17 === 0)
          .select((lit(1710000000000L) + $"user_id").as("ms"),
            $"user_id", lit(null).cast("long").as("event_id"),
            lit(null).cast("string").as("event_type"),
            lit(null).cast("long").as("vc"), lit("1").as("__deleted"))
        graft.log.LogBulkProducer.produceAt(
          updates.unionAll(tombstones),
          "ms", r, "profiles", orderCols = Seq("user_id"))
      }
      graft.log.LogStore.compactKeyed(root, "profiles", "user_id",
        graft.log.LogStore.maxId(root, "profiles"))
      s.read.format("graftlog")
        .option("path", root).option("stream", "profiles")
        .option("valueSchema",
          "user_id BIGINT, event_id BIGINT, event_type STRING, vc BIGINT")
        .load()
        .select(expr("graft_polyhash(concat_ws('|', user_id, event_id, " +
          "event_type, vc))").as("h"))
        .agg(count(lit(1)).as("n_keys"), expr("bit_xor(h)").as("xor_hash"),
          expr("CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            " % 1000000007 AS BIGINT)").as("sum_hash"))
    },

    q("q346_changelog_to_scd2", {
      val ph = graft.functions.TextHash.duckPolyHash(
        "concat_ws('|', user_id, event_id, valid_to)")
      // Changelog -> SCD2 dimension materialization: the q344 profiles
      // stream (updates + tombstone wave) read back UNcompacted and
      // folded into validity intervals — each update's valid_to is the
      // ms of the key's NEXT change (LEAD over the per-key id order), a
      // tombstone closes the final interval without opening one, and a
      // never-deleted key's last version stays open (valid_to -1). This
      // is how a warehouse keeps history while the compacted stream
      // (q344) keeps only serving state — same log, two read paths. The
      // certificate digests every version's (key, version id, valid_to),
      // so a missed close, a phantom open, or an interval attached to
      // the wrong key breaks the hash; the oracle re-derives the
      // intervals from the source table and the tombstone rule.
      s"""WITH u AS (SELECT user_id, event_id,
        |    1700000000000 + event_id AS ms FROM events),
        |t AS (SELECT DISTINCT user_id FROM events WHERE user_id % 17 = 0),
        |v AS (SELECT u.user_id, u.event_id, u.ms,
        |    LEAD(u.ms) OVER (PARTITION BY u.user_id ORDER BY u.event_id)
        |      AS next_ms
        |  FROM u),
        |iv AS (SELECT v.user_id, v.event_id,
        |    CASE WHEN v.next_ms IS NOT NULL THEN v.next_ms
        |      WHEN t.user_id IS NOT NULL THEN 1710000000000 + v.user_id
        |      ELSE -1 END AS valid_to
        |  FROM v LEFT JOIN t ON t.user_id = v.user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_versions,
        |  CAST(SUM(CASE WHEN valid_to = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_current,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_hash,
        |  CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |    AS BIGINT) AS sum_hash
        |FROM (SELECT user_id, event_id, valid_to, $ph AS h FROM iv)"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      // same fixture construction as q344, own key: this read path needs
      // the UNcompacted history (q344 compacts its copy in place)
      val root = graft.LogFixtures.producedLog(dir, "q346") { r =>
        val updates = v0.select(
          (lit(1700000000000L) + $"event_id").as("ms"),
          $"user_id", $"event_id", $"event_type", $"vc",
          lit(null).cast("string").as("__deleted"))
        val tombstones = v0.select($"user_id").distinct()
          .filter($"user_id" % 17 === 0)
          .select((lit(1710000000000L) + $"user_id").as("ms"),
            $"user_id", lit(null).cast("long").as("event_id"),
            lit(null).cast("string").as("event_type"),
            lit(null).cast("long").as("vc"), lit("1").as("__deleted"))
        graft.log.LogBulkProducer.produceAt(
          updates.unionAll(tombstones),
          "ms", r, "profiles", orderCols = Seq("user_id"))
      }
      val log = s.read.format("graftlog")
        .option("path", root).option("stream", "profiles")
        .option("valueSchema", "user_id BIGINT, event_id BIGINT, " +
          "event_type STRING, vc BIGINT, __deleted STRING")
        .load()
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          coalesce($"__deleted" === "1", lit(false)).as("del"))
      val byKey = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ms")
      val iv = log
        .withColumn("next_ms", lead($"ms", 1).over(byKey))
        .filter(!$"del") // tombstones close intervals, they are not versions
        .withColumn("valid_to", coalesce($"next_ms", lit(-1L)))
      iv.select($"user_id", $"event_id", $"valid_to",
          expr("graft_polyhash(concat_ws('|', user_id, event_id, " +
            "valid_to))").as("h"))
        .agg(count(lit(1)).as("n_versions"),
          sum(when($"valid_to" === -1L, 1L).otherwise(0L)).as("n_current"),
          expr("bit_xor(h)").as("xor_hash"),
          expr("CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            " % 1000000007 AS BIGINT)").as("sum_hash"))
    },

    q("q352_ktable_materialization",
      // KTable semantics end-to-end: a streaming aggregation in UPDATE
      // mode appends its CHANGED per-type counts to the log every
      // micro-batch (SupportsStreamingUpdateAsAppend on the sink — the
      // same contract the built-in Kafka sink uses; this is literally
      // the changelog a Kafka Streams KTable writes), and keyed
      // compaction (q344's LogStore.compactKeyed) folds the changelog to
      // its latest value per key — which must equal the one-shot batch
      // aggregation exactly. That is the materialized-view contract a
      // compacted topic serves: however many intermediate updates the
      // stream produced, compaction leaves current state and nothing
      // else. The oracle is just the batch GROUP BY.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type")
      val rootA = graft.LogFixtures.producedLog(dir, "q352") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      // the changelog: update-mode deltas appended per micro-batch. The
      // trigger scales with the input so the query always drains in ~5
      // snapshot epochs: a FIXED 3000-entry trigger degenerates to ~34
      // micro-batches at sf0.1 (~17 s of pure per-batch commit overhead
      // for 100k rows — the round-9 bench outlier), while the compacted
      // RESULT is identical at any batch count (that indifference is the
      // materialized-view contract itself, and the multi-epoch drain
      // still exercises it).
      val nIn = v0.count()
      val rootB = graft.TempDirs.scratch("graft-q352-ktable")
      // state store sized to the key cardinality (a handful of event types):
      // each of the ~5 epochs pays one state commit per partition, and the
      // session default (= core count) meant 32 commits a batch for state
      // that fits in one — ~2 s of pure commit overhead at sf0.1 (guide §2:
      // size from the data; the changelog CONTENT is partition-invariant)
      val q = graft.streaming.StreamHarness.withStatePartitions(s, 4) {
        s.readStream.format("graftlog")
          .option("path", rootA).option("stream", "events")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", math.max(3000L, nIn / 5).toString)
          .load()
          .select($"values".getItem("event_type").as("event_type"))
          .groupBy($"event_type").agg(count(lit(1)).as("n_events"))
          .writeStream.format("graftlog")
          .option("path", rootB).option("stream", "counts")
          .option("checkpointLocation",
            graft.TempDirs.scratch("graft-q352-ckpt"))
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      // compaction folds the changelog to current state per key
      graft.log.LogStore.compactKeyed(rootB, "counts", "event_type",
        graft.log.LogStore.maxId(rootB, "counts"))
      s.read.format("graftlog")
        .option("path", rootB).option("stream", "counts")
        .option("valueSchema", "event_type STRING, n_events BIGINT")
        .load()
        .select($"event_type", $"n_events")
        .orderBy($"event_type")
    },

    q("q353_streaming_psi",
      // q327's Population Stability Index RUNNING THROUGH the engine: the
      // stream maintains one (bin x period) counter grid in complete-mode
      // state — 20 cells, bounded forever — with bin bounds and the
      // period midpoint broadcast from the static side (production: the
      // reference window comes from yesterday's batch job, exactly like
      // this), and the Laplace-smoothed ln-term finalization runs
      // batch-side on the drained sink. Same oracle as the batch twin;
      // multi-batch drain proves the counters accumulate across commits.
      s"""WITH e AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc,
        |    CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ms
        |  FROM events),
        |b AS (SELECT MIN(vc) lo, MAX(vc) - MIN(vc) + 1 AS w,
        |    (MIN(ms) + MAX(ms)) // 2 AS mid FROM e),
        |h AS (SELECT ((vc - lo) * 10) // w AS bin,
        |    CASE WHEN ms <= mid THEN 1 ELSE 0 END AS in_a FROM e, b),
        |cnt AS (SELECT bin, CAST(SUM(in_a) AS BIGINT) AS ca,
        |    CAST(SUM(1 - in_a) AS BIGINT) AS cb FROM h GROUP BY bin),
        |grid AS (SELECT CAST(unnest(range(10)) AS BIGINT) AS bin),
        |z AS (SELECT grid.bin, COALESCE(cnt.ca, 0) AS ca,
        |    COALESCE(cnt.cb, 0) AS cb
        |  FROM grid LEFT JOIN cnt ON cnt.bin = grid.bin),
        |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM z),
        |pq AS (SELECT bin, ca, cb,
        |    ((ca + 1) * 1000000) // (na + 10) AS p_ppm,
        |    ((cb + 1) * 1000000) // (nb + 10) AS q_ppm FROM z, tot),
        |t AS (SELECT bin, ca, cb, p_ppm, q_ppm,
        |    CAST(FLOOR((p_ppm - q_ppm)
        |      * ${graft.ColFns.detLnSql("p_ppm", "q_ppm")} + 0.5) AS BIGINT)
        |      AS term_micro
        |  FROM pq)
        |SELECT bin, ca AS n_first_half, cb AS n_second_half, p_ppm, q_ppm,
        |  term_micro,
        |  CAST(SUM(term_micro) OVER () AS BIGINT) AS psi_micro,
        |  CASE WHEN SUM(term_micro) OVER () < 100000 THEN 'stable'
        |       WHEN SUM(term_micro) OVER () < 250000 THEN 'moderate'
        |       ELSE 'major' END AS drift_band
        |FROM t ORDER BY bin""") { (s, dir) =>
      import s.implicits._
      val e0 = Tables.load(s, dir, "events")
        .select($"event_id",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"),
          unix_millis($"ts").as("ms"))
      val root = graft.LogFixtures.producedLog(dir, "q353") { r =>
        graft.log.LogBulkProducer.produceAt(
          e0.select((lit(1700000000000L) + $"event_id").as("ms_id"),
            $"event_id", $"vc", $"ms"),
          "ms_id", r, "events", orderCols = Seq("event_id"))
      }
      val bounds = e0.agg(min($"vc").as("lo"),
        (max($"vc") - min($"vc") + 1).as("w"),
        expr("(MIN(ms) + MAX(ms)) div 2").as("mid"))
      val sink = graft.streaming.StreamHarness.runToMemory(
          s, "q353", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, vc BIGINT, ms BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .crossJoin(broadcast(bounds))
          .select(expr("((vc - lo) * 10) div w").as("bin"),
            when($"ms" <= $"mid", 1L).otherwise(0L).as("in_a"))
          .groupBy($"bin")
          .agg(sum($"in_a").as("ca"), sum(lit(1L) - $"in_a").as("cb"))
      }
      // fresh expr-ids: the finalization left-joins the sink into the
      // zero-filled grid (the q336 MemoryPlan dedup rule)
      val cnt = s.createDataFrame(sink.rdd, sink.schema)
      val z = s.range(0, 10).select($"id".as("bin"))
        .join(broadcast(cnt), Seq("bin"), "left")
        .select($"bin", coalesce($"ca", lit(0L)).as("ca"),
          coalesce($"cb", lit(0L)).as("cb"))
        .transform(graft.CacheScope.cached) // totals + terms
      val tot = z.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .unboundedFollowing)
      z.crossJoin(broadcast(tot))
        .withColumn("p_ppm", expr("((ca + 1) * 1000000) div (na + 10)"))
        .withColumn("q_ppm", expr("((cb + 1) * 1000000) div (nb + 10)"))
        .withColumn("term_micro",
          floor(($"p_ppm" - $"q_ppm")
            * graft.ColFns.detLn($"p_ppm", $"q_ppm") + 0.5).cast("long"))
        .withColumn("psi_micro", sum($"term_micro").over(all))
        .select($"bin", $"ca".as("n_first_half"), $"cb".as("n_second_half"),
          $"p_ppm", $"q_ppm", $"term_micro", $"psi_micro",
          when($"psi_micro" < 100000L, "stable")
            .when($"psi_micro" < 250000L, "moderate")
            .otherwise("major").as("drift_band"))
        .orderBy($"bin")
    },

    q("q355_quarantine_pipeline", {
      val ph = graft.functions.TextHash.duckPolyHash(
        "concat_ws('|', event_id, event_type, vc)")
      // Quarantine split — ingestion's bad-row routing: entries failing
      // the validation rule (the 'error' lane, or a negative amount)
      // divert to a QUARANTINE stream for triage, clean rows flow on,
      // and NOTHING is dropped. Two checkpointed pipe queries share the
      // source (each lane gets its own consumer position, exactly how a
      // production splitter is operated so lanes fail independently);
      // the certificate digests BOTH replicas and proves they PARTITION
      // the source: clean + quarantine counts and hashes reassemble the
      // whole input (xor of the two lane xors = source xor; sums add mod
      // P). The oracle computes all three digest sets from the table.
      s"""WITH src AS (SELECT event_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
        |lane AS (SELECT event_id, event_type, vc,
        |    event_type = 'error' OR vc < 0 AS bad, $ph AS h FROM src),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(bit_xor(h) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |      AS BIGINT) AS sm FROM lane WHERE NOT bad),
        |q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(bit_xor(h) AS BIGINT) AS x,
        |    CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |      AS BIGINT) AS sm FROM lane WHERE bad),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(bit_xor(h) AS BIGINT) AS x FROM lane)
        |SELECT c.n AS n_clean, q.n AS n_quarantine,
        |  c.x AS clean_xor, q.x AS quarantine_xor,
        |  c.n + q.n = t.n AND xor(c.x, q.x) = t.x AS partitions_source
        |FROM c, q, t"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val rootA = graft.LogFixtures.producedLog(dir, "q355") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"vc"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val rootB = graft.TempDirs.scratch("graft-q355-lanes")
      val badPred = "values['event_type'] = 'error' OR " +
        "CAST(values['vc'] AS BIGINT) < 0"
      // trigger scales with the input (q352's lesson): the lane digests
      // read payload values only, so they are identical at any batch
      // count — drain each lane in ~4 commits instead of 25 at sf0.1
      val nIn = v0.count()
      def lane(stream: String, keep: String): Unit = {
        val q = s.readStream.format("graftlog")
          .option("path", rootA).option("stream", "events")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", math.max(4000L, nIn / 4).toString)
          .load()
          .filter(expr(keep))
          .select($"values")
          .writeStream.format("graftlog")
          .option("path", rootB).option("stream", stream)
          .option("checkpointLocation",
            graft.TempDirs.scratch(s"graft-q355-ckpt-$stream"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      lane("clean", s"NOT ($badPred)")
      lane("quarantine", badPred)
      def digest(stream: String): DataFrame =
        s.read.format("graftlog")
          .option("path", rootB).option("stream", stream)
          .option("valueSchema",
            "event_id BIGINT, event_type STRING, vc BIGINT")
          .load()
          .select(expr("graft_polyhash(concat_ws('|', event_id, " +
            "event_type, vc))").as("h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
            expr("CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) " +
              "AS DECIMAL(38,0)) % 1000000007 AS BIGINT)").as("sm"))
      val t = v0
        .select(expr("graft_polyhash(concat_ws('|', event_id, " +
          "event_type, vc))").as("h"))
        .agg(count(lit(1)).as("tn"), expr("bit_xor(h)").as("tx"))
      broadcast(digest("clean")
          .select($"n".as("n_clean"), $"x".as("clean_xor")))
        .crossJoin(broadcast(digest("quarantine")
          .select($"n".as("n_quarantine"), $"x".as("quarantine_xor"))))
        .crossJoin(broadcast(t))
        .select($"n_clean", $"n_quarantine", $"clean_xor", $"quarantine_xor",
          ($"n_clean" + $"n_quarantine" === $"tn" &&
            expr("clean_xor ^ quarantine_xor") === $"tx")
            .as("partitions_source"))
    },

    q("q356_time_travel_diff",
      // Time-travel STATE DIFF over the changelog — the "what changed
      // between snapshot T1 and T2" readout a lakehouse answers from its
      // log without materializing either snapshot: per key, the latest
      // entry at or below each cutoff decides presence (tombstone-aware),
      // and the diff classifies every key as added / updated / deleted /
      // unchanged. Ids ARE timestamps in this log (millis-prefixed), so
      // any cutoff is exact. One per-key aggregation computes both
      // as-of states in a single pass (conditional MAX per cutoff — the
      // log is never read twice); the oracle re-derives the classes from
      // the source table and the tombstone rule. T1 = the update wave's
      // midpoint, T2 = the head (after the tombstone wave).
      """WITH h AS (SELECT (MAX(event_id)) // 2 AS hcut FROM events),
        |u AS (SELECT user_id,
        |    CAST(MIN(event_id) AS BIGINT) AS min_eid,
        |    CAST(MAX(event_id) AS BIGINT) AS max_eid,
        |    CAST(MAX(CASE WHEN event_id <= (SELECT hcut FROM h)
        |      THEN event_id END) AS BIGINT) AS pre_eid
        |  FROM events GROUP BY user_id),
        |cls AS (SELECT user_id,
        |    pre_eid IS NOT NULL AS at_t1,
        |    user_id % 17 <> 0 AS at_t2,
        |    max_eid > COALESCE(pre_eid, -1) AS changed
        |  FROM u)
        |SELECT
        |  CAST(SUM(CASE WHEN at_t1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_t1_keys,
        |  CAST(SUM(CASE WHEN at_t2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_t2_keys,
        |  CAST(SUM(CASE WHEN NOT at_t1 AND at_t2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_added,
        |  CAST(SUM(CASE WHEN at_t1 AND at_t2 AND changed THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_updated,
        |  CAST(SUM(CASE WHEN at_t1 AND NOT at_t2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_deleted,
        |  CAST(SUM(CASE WHEN at_t1 AND at_t2 AND NOT changed THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM cls""") { (s, dir) =>
      import s.implicits._
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      // same changelog fixture as q346 (shared memoized log)
      val root = graft.LogFixtures.producedLog(dir, "q346") { r =>
        val updates = v0.select(
          (lit(1700000000000L) + $"event_id").as("ms"),
          $"user_id", $"event_id", $"event_type", $"vc",
          lit(null).cast("string").as("__deleted"))
        val tombstones = v0.select($"user_id").distinct()
          .filter($"user_id" % 17 === 0)
          .select((lit(1710000000000L) + $"user_id").as("ms"),
            $"user_id", lit(null).cast("long").as("event_id"),
            lit(null).cast("string").as("event_type"),
            lit(null).cast("long").as("vc"), lit("1").as("__deleted"))
        graft.log.LogBulkProducer.produceAt(
          updates.unionAll(tombstones),
          "ms", r, "profiles", orderCols = Seq("user_id"))
      }
      val log = s.read.format("graftlog")
        .option("path", root).option("stream", "profiles")
        .option("valueSchema", "user_id BIGINT, event_id BIGINT, " +
          "event_type STRING, vc BIGINT, __deleted STRING")
        .load()
        .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
          coalesce($"__deleted" === "1", lit(false)).as("del"))
        .transform(graft.CacheScope.cached) // cutoff + the state fold
      val t1 = log.filter(!$"del")
        .agg(expr("(MAX(ms) - 1700000000000) div 2 + 1700000000000")
          .as("t1"))
      val cls = log.crossJoin(broadcast(t1))
        .groupBy($"user_id")
        .agg(
          max(when(!$"del" && $"ms" <= $"t1", $"ms")).as("pre_ms"),
          max(when(!$"del", $"ms")).as("max_ms"),
          max(when($"del", 1L).otherwise(0L)).as("tomb"))
        .select($"user_id",
          $"pre_ms".isNotNull.as("at_t1"),
          ($"tomb" === 0L).as("at_t2"),
          ($"max_ms" > coalesce($"pre_ms", lit(-1L))).as("changed"))
      cls.agg(
        sum(when($"at_t1", 1L).otherwise(0L)).as("n_t1_keys"),
        sum(when($"at_t2", 1L).otherwise(0L)).as("n_t2_keys"),
        sum(when(!$"at_t1" && $"at_t2", 1L).otherwise(0L)).as("n_added"),
        sum(when($"at_t1" && $"at_t2" && $"changed", 1L).otherwise(0L))
          .as("n_updated"),
        sum(when($"at_t1" && !$"at_t2", 1L).otherwise(0L)).as("n_deleted"),
        sum(when($"at_t1" && $"at_t2" && !$"changed", 1L).otherwise(0L))
          .as("n_unchanged"))
    },

    q("q341_stream_pipe_replication", {
      val ph = graft.functions.TextHash.duckPolyHash(
        "concat_ws('|', event_id, event_type, vc)")
      // Stream-to-stream replication with an exactly-once certificate —
      // THE reference workload (a consumer handler that filters a stream
      // and produces into another stream), run through the engine's own
      // source AND sink: events stream out of log A in multiple
      // micro-batches, the handler drops the 'error' lane, and the
      // survivors are appended to log B through the de-funneled staged
      // streaming sink with a checkpoint. The certificate is q339's
      // order/partitioning-independent digest triple over the REPLICA,
      // hash-compared against the oracle computing the same digests from
      // the source table directly — equal only if every surviving entry
      // crossed the pipe exactly once, whatever the batch boundaries did.
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_hash,
        |  CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |    AS BIGINT) AS sum_hash
        |FROM (SELECT $ph AS h FROM (SELECT event_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events WHERE event_type <> 'error'))"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val rootA = graft.LogFixtures.producedLog(dir, "q341") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"vc"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      // the pipe: source A -> handler filter -> engine streaming sink B
      val rootB = graft.TempDirs.scratch("graft-q341-replica")
      val pipe = s.readStream.format("graftlog")
        .option("path", rootA).option("stream", "events")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", severalBatchCap(s, dir)) // several commits
        .load()
        .filter($"values".getItem("event_type") =!= "error")
        .select($"values")
        .writeStream.format("graftlog")
        .option("path", rootB).option("stream", "replica")
        .option("checkpointLocation", graft.TempDirs.scratch("graft-q341-ckpt"))
        .start()
      pipe.processAllAvailable()
      pipe.stop()
      // certificate over the replica, read back through the typed source
      s.read.format("graftlog")
        .option("path", rootB).option("stream", "replica")
        .option("valueSchema",
          "event_id BIGINT, event_type STRING, vc BIGINT")
        .load()
        .select(expr(
          "graft_polyhash(concat_ws('|', event_id, event_type, vc))")
          .as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_hash"),
          expr("CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            " % 1000000007 AS BIGINT)").as("sum_hash"))
    },

    q("q342_pipe_resume_replication", {
      val ph = graft.functions.TextHash.duckPolyHash(
        "concat_ws('|', event_id, event_type, vc)")
      // q341's pipe interrupted and RESUMED: the first query processes
      // exactly one committed micro-batch (Trigger.Once + a trigger cap
      // of ~a third of the stream) and stops; a second query on the SAME
      // checkpoint drains the remainder with AvailableNow. The replica's
      // digest triple still equals the oracle's source digests — the
      // checkpoint-resume exactly-once contract (no re-append of the
      // committed batch, no gap at the seam), which is precisely what the
      // reference's crash-replay + ack machinery promises (consumer.ex
      // error channel -> supervised restart -> unacked reprocessing).
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_hash,
        |  CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |    AS BIGINT) AS sum_hash
        |FROM (SELECT $ph AS h FROM (SELECT event_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events WHERE event_type <> 'error'))"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val rootA = graft.LogFixtures.producedLog(dir, "q341") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"vc"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val rootB = graft.TempDirs.scratch("graft-q342-replica")
      val ckpt = graft.TempDirs.scratch("graft-q342-ckpt")
      def pipe(trigger: org.apache.spark.sql.streaming.Trigger,
          cap: String): Unit = {
        val q = s.readStream.format("graftlog")
          .option("path", rootA).option("stream", "events")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", cap)
          .load()
          .filter($"values".getItem("event_type") =!= "error")
          .select($"values")
          .writeStream.format("graftlog")
          .option("path", rootB).option("stream", "replica")
          .option("checkpointLocation", ckpt)
          .trigger(trigger)
          .start()
        q.awaitTermination()
      }
      // phase 1: one committed batch of ~a third of the stream, then stop
      // (the "crash") — cap scaled from the input so the phase split holds
      // at any SF (a fixed 3000 meant 1+33 batches at sf0.1)
      val resumeCap = math.max(3000L,
        Tables.rowCount(s, dir, "events") / 3 + 1).toString
      pipe(org.apache.spark.sql.streaming.Trigger.Once(), resumeCap)
      // phase 2: resume from the checkpoint, drain the rest
      pipe(org.apache.spark.sql.streaming.Trigger.AvailableNow(), resumeCap)
      s.read.format("graftlog")
        .option("path", rootB).option("stream", "replica")
        .option("valueSchema",
          "event_id BIGINT, event_type STRING, vc BIGINT")
        .load()
        .select(expr(
          "graft_polyhash(concat_ws('|', event_id, event_type, vc))")
          .as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_hash"),
          expr("CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            " % 1000000007 AS BIGINT)").as("sum_hash"))
    },

    q("q343_sharded_pipe_replication", {
      val ph = graft.functions.TextHash.duckPolyHash(
        "concat_ws('|', event_id, event_type, vc)")
      // q341's pipe through the SHARDED streaming sink (shards=4,
      // user-keyed): the scale path where one logical stream fans out to
      // four physical shard streams so sink append parallelism is not
      // bottlenecked on a single tail — per-shard ids stay monotonic,
      // global order across shards is explicitly surrendered (the same
      // trade every partitioned log makes), and shardKey=user_id keeps
      // each user's events in ONE shard (per-key order preserved). The
      // digest certificate is shard-count-invariant by construction, so
      // the oracle is identical to q341's — equal only if the fan-out
      // neither dropped, duplicated, nor cross-wired an entry.
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_hash,
        |  CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT) % 1000000007
        |    AS BIGINT) AS sum_hash
        |FROM (SELECT $ph AS h FROM (SELECT event_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events WHERE event_type <> 'error'))"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val rootA = graft.LogFixtures.producedLog(dir, "q343") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"user_id", $"event_type", $"vc"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val rootB = graft.TempDirs.scratch("graft-q343-replica")
      val pipe = s.readStream.format("graftlog")
        .option("path", rootA).option("stream", "events")
        .option("startingOffsets", "earliest")
        .option("maxEntriesPerTrigger", severalBatchCap(s, dir))
        .load()
        .filter($"values".getItem("event_type") =!= "error")
        // the sharded sink routes on a top-level column of the write
        // schema, so the payload is re-projected to typed columns here
        .select($"values".getItem("event_id").as("event_id"),
          $"values".getItem("user_id").as("user_id"),
          $"values".getItem("event_type").as("event_type"),
          $"values".getItem("vc").as("vc"))
        .writeStream.format("graftlog")
        .option("path", rootB).option("stream", "replica")
        .option("shards", "4").option("shardKey", "user_id")
        .option("checkpointLocation", graft.TempDirs.scratch("graft-q343-ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      pipe.awaitTermination()
      // read all four shard streams back through the multi-stream reader
      val shardNames = (0 until 4).map(i => s"replica.s$i")
      val replica = s.read.format("graftlog")
        .option("path", rootB).option("stream", shardNames.mkString(","))
        .option("valueSchema",
          "event_id BIGINT, event_type STRING, vc BIGINT")
        .load()
      replica
        .select(expr(
          "graft_polyhash(concat_ws('|', event_id, event_type, vc))")
          .as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_hash"),
          expr("CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            " % 1000000007 AS BIGINT)").as("sum_hash"))
    },

    q("q336_streaming_cusum",
      // q324's CUSUM change detector RUNNING CONTINUOUSLY through the
      // engine: daily volumes accumulate per (type, day) in complete-mode
      // streaming state — bounded by the calendar regardless of stream
      // length, the run-forever property — and the prefix-min closed form
      // finalizes batch-side on the drained sink, exactly how an alerting
      // dashboard reads the live counter table. Oracle = the batch twin's
      // arithmetic over the same events. Multi-batch drain proves the
      // counters accumulate across micro-batches before the detector
      // scans them.
      """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(day) lo, MAX(day) hi FROM c),
        |days AS (SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |g AS (SELECT t.event_type, days.day, COALESCE(c.n, 0) AS n
        |  FROM (SELECT DISTINCT event_type FROM c) t CROSS JOIN days
        |  LEFT JOIN c ON c.event_type = t.event_type AND c.day = days.day),
        |k AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    (CAST(SUM(n) AS BIGINT) * 1000000) // COUNT(*) AS k_micro
        |  FROM g GROUP BY event_type),
        |p AS (SELECT g.event_type, g.day, k.n_days, k.k_micro,
        |    SUM(g.n) OVER (PARTITION BY g.event_type ORDER BY g.day)
        |      * 1000000
        |    - CAST(ROW_NUMBER() OVER (PARTITION BY g.event_type
        |        ORDER BY g.day) AS BIGINT) * k.k_micro AS pm
        |  FROM g JOIN k ON k.event_type = g.event_type),
        |s AS (SELECT event_type, day, n_days, k_micro,
        |    pm - LEAST(CAST(0 AS BIGINT), MIN(pm) OVER (
        |      PARTITION BY event_type ORDER BY day)) AS cusum_micro
        |  FROM p),
        |r AS (SELECT event_type, day, n_days, k_micro, cusum_micro,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cusum_micro DESC, day) AS rk,
        |    CASE WHEN cusum_micro >= k_micro THEN 1 ELSE 0 END AS alarm
        |  FROM s)
        |SELECT event_type, CAST(MIN(n_days) AS BIGINT) AS n_days,
        |  CAST(MIN(k_micro) AS BIGINT) AS k_micro,
        |  CAST(MAX(cusum_micro) AS BIGINT) AS max_cusum_micro,
        |  MIN(CASE WHEN rk = 1 THEN day END) AS peak_day,
        |  CAST(SUM(alarm) AS BIGINT) AS n_alarm_days
        |FROM r GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          to_date($"ts").cast("string").as("day"))
      val root = graft.LogFixtures.producedLog(dir, "q336") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"day"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      // streaming state = one counter per (type, day) — calendar-bounded
      val sink = graft.streaming.StreamHarness.runToMemory(
          s, "q336", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema",
            "event_id BIGINT, event_type STRING, day STRING")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .groupBy($"event_type", $"day".cast("date").as("day"))
          .agg(count(lit(1)).as("n"))
      }
      // rebuild the drained sink as a fresh frame: the finalization joins
      // the counter table against itself, and MemoryPlan views fail
      // Spark's self-join attribute dedup (fresh expr-ids sidestep it);
      // the table is calendar-bounded, so the rebuild is constant-size
      val daily = s.createDataFrame(sink.rdd, sink.schema)
        .transform(graft.CacheScope.cached) // grid + bounds
      // batch-side finalization — identical arithmetic to q324
      val b = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
      val days = b.select(explode(expr(
        "sequence(lo, hi, interval 1 day)")).as("day"))
      val g = daily.select($"event_type").distinct()
        .crossJoin(broadcast(days))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", coalesce($"n", lit(0L)).as("n"))
        .transform(graft.CacheScope.cached) // k + window passes
      val k = g.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          expr("(SUM(n) * 1000000) div COUNT(*)").as("k_micro"))
      val byDayW = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val r = g.join(broadcast(k), Seq("event_type"))
        .withColumn("pm",
          sum($"n").over(byDayW) * 1000000L -
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy($"event_type").orderBy($"day")).cast("long")
              * $"k_micro")
        .withColumn("cusum_micro",
          $"pm" - least(lit(0L), min($"pm").over(byDayW)))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"event_type")
            .orderBy($"cusum_micro".desc, $"day")))
        .withColumn("alarm",
          when($"cusum_micro" >= $"k_micro", 1L).otherwise(0L))
      r.groupBy($"event_type")
        .agg(min($"n_days").as("n_days"), min($"k_micro").as("k_micro"),
          max($"cusum_micro").as("max_cusum_micro"),
          min(when($"rk" === 1, $"day")).as("peak_day"),
          sum($"alarm").as("n_alarm_days"))
        .orderBy($"event_type")
    },

    q("q191_streaming_kmv", {
      val P = graft.functions.TextHash.P
      val ph = graft.functions.TextHash.duckPolyHash("CAST(user_id AS VARCHAR)")
      val k = graft.operators.UdfSurface.KmvK
      s"""WITH u AS (SELECT DISTINCT event_type,
         |    (($ph) * 2654435761) % $P AS h FROM events),
         |r AS (SELECT event_type, h,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM u)
         |SELECT event_type,
         |  CAST(MAX(CASE WHEN rn = $k THEN h END) AS BIGINT) AS kth_min,
         |  (${(k - 1) * graft.functions.TextHash.P})
         |    // MAX(CASE WHEN rn = $k THEN h END) AS est_n
         |FROM r GROUP BY event_type ORDER BY event_type"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      // q184's KMV sketch AS STREAMING STATE: the typed Aggregator rides a
      // complete-mode streaming aggregation, so each micro-batch merges new
      // hashes into the persisted K-long buffer — the distinct-count-
      // forever query whose state stays K longs per group no matter how
      // long the stream runs (an exact streaming countDistinct would hold
      // the whole key set in state). The estimate is finalized batch-side
      // from the drained sketch, like q182's dashboard read. The oracle
      // replays the order statistics exactly — est included, since the
      // sketch is deterministic in the data.
      val kmvK = graft.operators.UdfSurface.KmvK
      val kmv = udaf(graft.operators.UdfSurface.KmvSketch)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type", $"user_id")
      val root = graft.LogFixtures.producedLog(dir, "q191") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"user_id"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val sk = graft.streaming.StreamHarness.runToMemory(
          s, "q191", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, event_type STRING, user_id BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .select($"event_type", expr(
            s"(graft_polyhash(CAST(user_id AS STRING)) * 2654435761) % ${graft.functions.TextHash.P}")
            .as("h"))
          .groupBy($"event_type")
          .agg(kmv($"h").as("mins"))
      }
      sk.withColumn("kth_min",
          when(size($"mins") >= kmvK, element_at($"mins", kmvK)).cast("long"))
        .select($"event_type", $"kth_min",
          expr(s"${(kmvK - 1) * graft.functions.TextHash.P} DIV kth_min").as("est_n"))
        .orderBy($"event_type")
    },

    q("q200_streaming_heavy_hitters",
      // The fixture key space (user_id % 40 per event type) sits below the
      // MgK=64 counter budget, so no eviction fires and the sketch is
      // EXACT — the oracle hash-checks the streamed estimates against true
      // counts, certifying reduce/merge through the streaming state path.
      """SELECT event_type, CAST(user_id % 40 AS VARCHAR) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS est_n
        |FROM events GROUP BY event_type, CAST(user_id % 40 AS VARCHAR)
        |ORDER BY event_type, k""") { (s, dir) =>
      import s.implicits._
      // q119's Misra-Gries sketch AS STREAMING STATE: the mergeable
      // Aggregator rides a complete-mode streaming aggregation, so each
      // micro-batch folds new keys into the persisted <=MgK-counter map —
      // the trending/top-keys-forever query whose per-group state is
      // BOUNDED by the counter budget no matter how long the stream runs
      // (an exact streaming count would hold the full key space; at real
      // cardinality MG keeps the n/(k+1) heavy-hitter contract instead of
      // exactness). Estimates are finalized batch-side off the drained
      // sketch, q182/q191's dashboard-read pattern.
      val mg = udaf(graft.operators.UdfSurface.MisraGries)
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type", $"user_id")
      val root = graft.LogFixtures.producedLog(dir, "q200") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"user_id"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val sk = graft.streaming.StreamHarness.runToMemory(
          s, "q200", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, event_type STRING, user_id BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .select($"event_type",
            expr("CAST(user_id % 40 AS STRING)").as("k"))
          .groupBy($"event_type")
          .agg(mg($"k").as("sk"))
      }
      sk.select($"event_type", explode($"sk"))
        .toDF("event_type", "k", "est_n")
        .orderBy($"event_type", $"k")
    },

    q("q375_streaming_countmin", {
      val duckCell = graft.functions.TextHash.duckPolyHash(
        "CAST(user_id AS VARCHAR) || '#' || CAST(r AS VARCHAR)")
      // q374's count-min sketch AS STREAMING STATE through the engine's
      // source: each micro-batch votes its events into the 4x256 cell
      // grid via a plain complete-mode keyed count — CMS updates ARE
      // counter additions, so the engine's built-in partial-aggregate
      // merge IS the sketch merge, no custom state needed, and state
      // stays <=1024 counters forever whatever the stream length. The
      // probe finalizes batch-side (q182/q191's dashboard-read pattern)
      // against the exact top-10, and the oracle replays the whole thing
      // from the batch table — streamed cells must equal batch cells
      // exactly or the min-over-rows estimates flip.
      s"""WITH ex AS (SELECT user_id, CAST(unnest(range(4)) AS BIGINT) AS r
         |  FROM events),
         |cms AS (SELECT r, ($duckCell) % 256 AS c,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM ex GROUP BY r, ($duckCell) % 256),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
         |top AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
         |  FROM events GROUP BY user_id
         |  ORDER BY exact_n DESC, user_id LIMIT 10),
         |probe AS (SELECT t.user_id, t.exact_n, x.r, ($duckCell) % 256 AS c
         |  FROM top t CROSS JOIN (SELECT CAST(unnest(range(4)) AS BIGINT)
         |    AS r) x),
         |est AS (SELECT p.user_id, p.exact_n, MIN(s.n) AS est_n
         |  FROM probe p JOIN cms s ON s.r = p.r AND s.c = p.c
         |  GROUP BY p.user_id, p.exact_n)
         |SELECT e.user_id, e.exact_n, CAST(e.est_n AS BIGINT) AS est_n,
         |  CAST(e.est_n - e.exact_n AS BIGINT) AS overcount,
         |  CAST(((e.est_n - e.exact_n) * 256) // nn.n AS BIGINT)
         |    AS over_x256_per_n
         |FROM est e, nn ORDER BY exact_n DESC, user_id"""
    }) { (s, dir) =>
      import s.implicits._
      graft.functions.GraftExpressions.register(s)
      val cellExpr = "graft_polyhash(CAST(user_id AS STRING) || '#' || " +
        "CAST(r AS STRING)) % 256"
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id")
      val root = graft.LogFixtures.producedLog(dir, "q375") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"user_id"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val cms = graft.streaming.StreamHarness.runToMemory(
          s, "q375", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, user_id BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .select($"user_id", explode(sequence(lit(0L), lit(3L))).as("r"))
          .select($"r", expr(cellExpr).as("c"))
          .groupBy($"r", $"c").count().withColumnRenamed("count", "n")
      }
      val ev = Tables.load(s, dir, "events").select($"user_id")
        .transform(graft.CacheScope.cached) // total + exact probe
      val nn = ev.agg(count(lit(1)).as("n_total"))
      val top = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy($"exact_n".desc, $"user_id").limit(10)
      top.select($"user_id", $"exact_n",
          explode(sequence(lit(0L), lit(3L))).as("r"))
        .select($"user_id", $"exact_n", $"r", expr(cellExpr).as("c"))
        .join(broadcast(cms), Seq("r", "c"))
        .groupBy($"user_id", $"exact_n").agg(min($"n").as("est_n"))
        .crossJoin(broadcast(nn))
        .select($"user_id", $"exact_n", $"est_n",
          ($"est_n" - $"exact_n").as("overcount"),
          expr("((est_n - exact_n) * 256) div n_total").as("over_x256_per_n"))
        .orderBy($"exact_n".desc, $"user_id")
    },

    q("q209_streaming_profile",
      // The streaming twin of q193's batch profiler: per-type count /
      // min / max / exact integer sum maintained as complete-mode
      // streaming state — the live drift monitor a data-quality gate
      // reads between ingest batches. Values ride as pre-normalized
      // cents so every streamed aggregate is integer-exact.
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_c,
        |  CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_c,
        |  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      // Complete-mode built-in streaming aggregation (no custom state):
      // per-group state is the four scalar aggregates forever — constant
      // per key — while each micro-batch folds its partial aggregates in.
      // This is the query behind a "source health" dashboard: null-rate /
      // range drift shows up as min/max movement between reads of the
      // sink table. Distinct from q78 (windowed event-time agg) and
      // q191/q200 (sketch state): plain keyed aggregates as long-lived
      // streaming state through the engine's source.
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"event_type",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("value_c"))
      val root = graft.LogFixtures.producedLog(dir, "q209") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"value_c"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      graft.streaming.StreamHarness.runToMemory(
          s, "q209", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, event_type STRING, value_c BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), min($"value_c").as("min_c"),
            max($"value_c").as("max_c"), sum($"value_c").as("sum_c"))
      }.orderBy($"event_type")
    },

    q("q216_streaming_locf",
      // Streaming forward fill THROUGH the engine (q99's batch window as
      // unbounded per-key ValueState): 'error' readings are missing and
      // inherit the user's last good value, -1 before any. The oracle is
      // the batch LOCF twin over the same events in integer cents.
      """WITH t AS (SELECT user_id, event_id,
        |    CASE WHEN event_type = 'error' THEN NULL
        |         ELSE CAST(FLOOR(value*100 + 0.5) AS BIGINT) END AS v
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(COALESCE(LAST_VALUE(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS BIGINT)
        |    AS filled_c
        |FROM t ORDER BY user_id, event_id""") { (s, dir) =>
      import s.implicits._
      // transformWithState ValueState LOCF (StreamingOps.LocfProcessor):
      // one long per user forever, point-updated in RocksDB — the repair
      // pass a live feature pipeline runs where q99 needs the whole
      // history in a window. In-batch rows sort by event_id inside the
      // processor; across batches the log's id-ordered delivery is the
      // sequence order, so the streamed fill equals the batch window
      // exactly — the oracle hash-checks every row.
      val v0 = Tables.load(s, dir, "events").select(
        $"event_id", $"user_id",
        when($"event_type" === "error", lit(Long.MinValue))
          .otherwise(expr("CAST(FLOOR(value*100 + 0.5) AS BIGINT)")).as("obs"))
      val root = graft.LogFixtures.producedLog(dir, "q216") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"user_id", $"obs"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      graft.streaming.StreamHarness.runToMemory(s, "q216", 4, rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, user_id BIGINT, obs BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
        graft.streaming.StreamingOps
          .forwardFillByKeyTws(s, src, "user_id", "event_id", "obs")
          .toDF("user_id", "event_id", "filled_c")
      }
        .select($"user_id".cast("long").as("user_id"), $"event_id", $"filled_c")
        .orderBy($"user_id", $"event_id")
    },

    q("q224_streaming_anomaly",
      // Streaming 3-sigma anomaly flags THROUGH the engine: each reading
      // judged against its type's running moments BEFORE it (state can't
      // be polluted by the value it judges), cross-multiplied integers so
      // there is no float mean/variance. Oracle = the batch cumulative
      // window stating the identical arithmetic. flag -1 = warm-up (n<30).
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(FLOOR(value*10 + 0.5) AS BIGINT) AS vd
        |  FROM events),
        |w AS (SELECT event_type, event_id, vd,
        |    COUNT(*) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n,
        |    SUM(vd) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s,
        |    SUM(vd*vd) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ss
        |  FROM e)
        |SELECT event_type, event_id, vd,
        |  CASE WHEN n < 30 THEN -1
        |       WHEN (n*vd - s)*(n*vd - s) > 9*(n*ss - s*s) THEN 1
        |       ELSE 0 END AS flag
        |FROM w ORDER BY event_type, event_id""") { (s, dir) =>
      import s.implicits._
      // The live data-quality tripwire: per-type running (n, sum, sumsq)
      // as ONE ValueState tuple — constant state per key forever — with
      // deci-dollar values keeping the cross-multiplied test far below
      // 2^63. The streamed verdict equals the batch window's row for row
      // (in-batch sort + id-ordered delivery), so the oracle hash-checks
      // every event's flag, warm-up included.
      val v0 = Tables.load(s, dir, "events").select(
        $"event_id", $"event_type",
        expr("CAST(FLOOR(value*10 + 0.5) AS BIGINT)").as("vd"))
      val root = graft.LogFixtures.producedLog(dir, "q224") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"event_type", $"vd"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      graft.streaming.StreamHarness.runToMemory(s, "q224", 4, rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, event_type STRING, vd BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
        graft.streaming.StreamingOps
          .anomalyFlagsByKeyTws(s, src, "event_type", "event_id", "vd", 30L)
          .toDF("event_type", "event_id", "vd", "flag")
      }
        .select($"event_type", $"event_id", $"vd", $"flag")
        .orderBy($"event_type", $"event_id")
    },

    q("q233_streaming_funnel",
      // Live conversion funnel THROUGH the engine: events ride the log in
      // event-time order (bulk-produce keyed on event millis, sub-ms order
      // pinned by the tsu orderCol), a per-user transformWithState machine
      // advances view -> click -> purchase with the strictly-later rule,
      // and the drained stage-transition rows aggregate to the SAME three
      // funnel rows as q227's batch chained-min formulation — which is the
      // oracle. State: one (stage, ts) tuple per user, forever; sink
      // volume: <= 3 rows per user regardless of stream length.
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        |c AS (SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |    CAST(COUNT(*) AS BIGINT) AS users_reached FROM s1
        |  UNION ALL SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3),
        |base AS (SELECT users_reached AS u1 FROM c WHERE step = 1)
        |SELECT step, step_name, users_reached,
        |  users_reached * 1000000 // u1 AS conv_ppm
        |FROM c, base ORDER BY step""") { (s, dir) =>
      import s.implicits._
      val root = graft.LogFixtures.producedLog(dir, "q233") { r =>
        graft.log.LogBulkProducer.produceAt(
          Tables.load(s, dir, "events").select(
            unix_millis($"ts").as("ms"), unix_micros($"ts").as("tsu"),
            $"event_id", $"user_id".cast("string").as("user_id"),
            $"event_type"),
          "ms", r, "ev", orderCols = Seq("tsu", "event_id"))
      }
      val fin = graft.streaming.StreamHarness.runToMemory(s, "q233", 4,
        rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("valueSchema",
            "tsu BIGINT, event_id BIGINT, user_id STRING, event_type STRING")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
        graft.streaming.StreamingOps
          .funnelByUserTws(s, src, "user_id", "tsu", "event_type", "event_id",
            Seq("view", "click", "purchase"))
          .toDF("user_id", "stage")
      }
      // each user emits a given stage at most once, so the per-stage row
      // count IS users_reached
      val counts = fin.groupBy($"stage").agg(count(lit(1)).as("users_reached"))
      val steps = Seq((1, "view"), (2, "click"), (3, "purchase"))
        .map { case (i, n) => (i.toLong, n) }
        .toDF("step", "step_name")
      val base = counts.filter($"stage" === 1)
        .select($"users_reached".as("u1"))
      steps.join(counts, $"step" === $"stage")
        .crossJoin(broadcast(base))
        .select($"step", $"step_name", $"users_reached",
          expr("(users_reached * 1000000) DIV u1").as("conv_ppm"))
        .orderBy($"step")
    },

    q("q282_streaming_benford",
      // q265's Benford screen as a LIVE data-quality monitor: per-digit
      // counts maintained as complete-mode streaming state (9 counters
      // forever), with the expected-share comparison finalized batch-side
      // off the sink — the pattern of a dashboard reading a live counter
      // table (q182/q209). A fabricated-amounts incident shows up as
      // dev_ppm drift between reads without rescanning history. Zero
      // amounts carry no leading digit and are filtered ON INGEST in both
      // engines (stated contract).
      """WITH c AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit FROM c WHERE cents > 0),
        |o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
        |  GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM o),
        |e AS (SELECT CAST(dg AS BIGINT) AS digit,
        |    CAST(ep AS BIGINT) AS expected_ppm
        |  FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
        |    (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
        |    v(dg, ep))
        |SELECT e.digit, COALESCE(o.n, 0) AS n,
        |  CAST((1000000 * COALESCE(o.n, 0)) // t.total AS BIGINT)
        |    AS observed_ppm,
        |  e.expected_ppm,
        |  CAST(abs((1000000 * COALESCE(o.n, 0)) // t.total - e.expected_ppm)
        |    AS BIGINT) AS dev_ppm
        |FROM e LEFT JOIN o ON o.digit = e.digit, t
        |ORDER BY e.digit""") { (s, dir) =>
      import s.implicits._
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id",
          expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val root = graft.LogFixtures.producedLog(dir, "q282") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"cents"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      val streamed = graft.streaming.StreamHarness.runToMemory(
          s, "q282", 2, mode = "complete") {
        s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema", "event_id BIGINT, cents BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir))
          .load()
          .filter($"cents" > 0)
          .select(substring($"cents".cast("string"), 1, 1).cast("long")
            .as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("n"))
      }
      val t = streamed.agg(sum($"n").as("total"))
      val e = Seq(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
          4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
          8L -> 51153L, 9L -> 45757L)
        .toDF("digit", "expected_ppm")
      e.join(streamed, Seq("digit"), "left")
        .withColumn("n", coalesce($"n", lit(0L)))
        .crossJoin(broadcast(t))
        .select($"digit", $"n",
          expr("(1000000 * n) div total").as("observed_ppm"),
          $"expected_ppm",
          expr("abs((1000000 * n) div total - expected_ppm)").as("dev_ppm"))
        .orderBy($"digit")
    },

    q("q300_streaming_cep",
      // q292's CEP pattern (click-then-purchase-within-30min-unless-error)
      // run LIVE through the engine on transformWithState: per user, ONE
      // (lastClick, lastError) ValueState pair forever — constant state
      // however long the stream runs, where the batch form needs the full
      // history in a window. Matches emit as append-mode events the moment
      // the purchase arrives (the alerting shape); the per-user rollup
      // happens batch-side off the sink. Oracle = q292's batch window
      // twin over the same events — the streamed state machine must
      // reproduce it row for row across micro-batch boundaries.
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(ts) AS us, event_id,
        |    MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click,
        |    MAX(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error
        |  FROM events),
        |m AS (SELECT user_id, us - last_click AS gap_us FROM e
        |  WHERE event_type = 'purchase' AND last_click IS NOT NULL
        |    AND us - last_click <= 1800000000
        |    AND (last_error IS NULL OR last_error < last_click))
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  CAST(MIN(gap_us) AS BIGINT) AS min_gap_us
        |FROM m GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      import s.implicits._
      val v0 = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          expr("unix_micros(ts)").as("us"))
      val root = graft.LogFixtures.producedLog(dir, "q300") { r =>
        graft.log.LogBulkProducer.produceAt(
          v0.select((lit(1700000000000L) + $"event_id").as("ms"),
            $"event_id", $"user_id", $"event_type", $"us"),
          "ms", r, "events", orderCols = Seq("event_id"))
      }
      graft.streaming.StreamHarness.runToMemory(s, "q300", 4,
          rocksdb = true) {
        val src = s.readStream.format("graftlog")
          .option("path", root).option("stream", "events")
          .option("valueSchema",
            "event_id BIGINT, user_id BIGINT, event_type STRING, us BIGINT")
          .option("startingOffsets", "earliest")
          .option("maxEntriesPerTrigger", twoBatchCap(s, dir)) // 2 batches at any SF >= 0.01 (1 below the floor)
          .load()
        graft.streaming.StreamingOps
          .cepMatchesByKeyTws(s, src, "user_id", "event_id", "us",
            "event_type", 1800000000L)
          .toDF("user_id", "match_id", "gap_us")
      }
        .groupBy($"user_id".cast("long").as("user_id"))
        .agg(count(lit(1)).as("n_matches"), min($"gap_us").as("min_gap_us"))
        .orderBy($"user_id")
    },

    q("q399_dlq_audit",
      // The dead-letter queue contract, oracle-checked end-to-end: a
      // consumer whose handler rejects every 'error' event (Err,
      // raiseErrors=false) runs, restarts, and on the SECOND failed
      // delivery (maxDeliveries=2) each poison message must be parked in
      // the DLQ stream with provenance — exactly once, with the attempt
      // count — and acked so it never redelivers. The oracle is the
      // batch statement of which messages MUST be dead-lettered: every
      // 'error' event in the consumed slice, each with attempts = 2.
      // The slice is bounded (event_id < 2000) because this probes the
      // per-message LIFECYCLE contract, not throughput — same posture as
      // the trim/compaction lifecycle queries; logs, checkpoints, and
      // the DLQ stream are all freshly scratch-rooted per run so replays
      // of the query are deterministic.
      """SELECT event_id, CAST(2 AS BIGINT) AS attempts,
        |  'events' AS src_stream
        |FROM events WHERE event_type = 'error' AND event_id < 2000
        |ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      val root = graft.TempDirs.scratch("graft-q399-dlq")
      val slice = Tables.load(s, dir, "events")
        .filter($"event_id" < 2000)
        .select((lit(1700000000000L) + $"event_id").as("ms"),
          $"event_id", $"event_type")
      graft.log.LogBulkProducer.produceAt(
        slice, "ms", root, "events", orderCols = Seq("event_id"))
      val cfg = graft.consumer.ConsumerConfig(
        logRoot = root, stream = "events",
        checkpointRoot = graft.TempDirs.scratch("graft-q399-ckpt"),
        groupName = Some("dlq_audit"), startPos = "earliest",
        raiseErrors = false, maxDeliveries = Some(2),
        deadLetterStream = Some("dlq"))
      val handler: (String, Option[String], String, Map[String, String]) =>
          graft.consumer.HandlerResult = (_, _, _, values) =>
        if (values("event_type") == "error")
          graft.consumer.HandlerResult.Err(
            new RuntimeException("validation failed"))
        else graft.consumer.HandlerResult.Ok
      // delivery 1: live batch — errors defer into the pending ledger
      graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, handler, until = _ => true).stop()
      // delivery 2: the restart's pending drain — poison parks in the DLQ
      graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, handler, until = _ => true).stop()
      s.read.format("graftlog")
        .option("path", root).option("stream", "dlq")
        .option("valueSchema",
          "event_id BIGINT, __dlq_attempts BIGINT, __dlq_stream STRING")
        .load()
        .select($"event_id", $"__dlq_attempts".as("attempts"),
          $"__dlq_stream".as("src_stream"))
        .orderBy($"event_id")
    },

    q("q450_dlq_redrive",
      // DLQ RE-DRIVE, oracle-checked end-to-end — the operational
      // completion of q399's park: the same failing consumer parks every
      // 'error' event after 2 failed deliveries; DlqRedrive then moves
      // the parked messages back onto the source stream (fresh ids =>
      // attempts reset; __redrive_* provenance retained; __dlq_* envelope
      // stripped; DLQ trimmed), and a FIXED consumer resumes from its
      // checkpoint. The oracle pins the whole loop: every error event is
      // processed EXACTLY ONCE on re-drive (n_deliveries = 1 — fresh
      // message, first delivery succeeds), carries the original entry id
      // and the park-time attempt count as provenance, the DLQ is empty
      // afterwards, and a second redrive is a no-op (re-injection is
      // exactly-once at the operator level). Bounded lifecycle probe,
      // q399's posture; fresh scratch roots per run.
      """SELECT event_id,
        |  CAST(1 AS BIGINT) AS n_deliveries,
        |  CAST(2 AS BIGINT) AS attempts_was,
        |  CAST(1700000000000 + event_id AS VARCHAR) || '-0' AS redrive_of,
        |  CAST(0 AS BIGINT) AS n_left_in_dlq,
        |  CAST(0 AS BIGINT) AS redrive2_n
        |FROM events WHERE event_type = 'error' AND event_id < 2000
        |ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      val root = graft.TempDirs.scratch("graft-q450-dlq")
      val slice = Tables.load(s, dir, "events")
        .filter($"event_id" < 2000)
        .select((lit(1700000000000L) + $"event_id").as("ms"),
          $"event_id", $"event_type")
      graft.log.LogBulkProducer.produceAt(
        slice, "ms", root, "events", orderCols = Seq("event_id"))
      val cfg = graft.consumer.ConsumerConfig(
        logRoot = root, stream = "events",
        checkpointRoot = graft.TempDirs.scratch("graft-q450-ckpt"),
        groupName = Some("redrive_audit"), startPos = "earliest",
        raiseErrors = false, maxDeliveries = Some(2),
        deadLetterStream = Some("dlq"))
      val failing: (String, Option[String], String, Map[String, String]) =>
          graft.consumer.HandlerResult = (_, _, _, values) =>
        if (values("event_type") == "error")
          graft.consumer.HandlerResult.Err(
            new RuntimeException("validation failed"))
        else graft.consumer.HandlerResult.Ok
      // deliveries 1+2: errors defer, then park in the DLQ (q399's path)
      graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, failing, until = _ => true).stop()
      graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, failing, until = _ => true).stop()
      // the fix ships: re-drive the parked messages onto the source stream
      val r1 = graft.consumer.DlqRedrive.redrive(root, "dlq")
      require(r1.redriven > 0, "redrive found nothing parked")
      // fixed consumer resumes from its checkpoint: sees ONLY the
      // re-driven entries (everything else was acked), processes them Ok
      val processed =
        new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
      val fixed: (String, Option[String], String, Map[String, String]) =>
          graft.consumer.HandlerResult = (_, _, _, values) => {
        processed.add(values)
        graft.consumer.HandlerResult.Ok
      }
      graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, fixed, until = _ => true).stop()
      // a second redrive must find an empty DLQ (trimmed by the first)
      val r2 = graft.consumer.DlqRedrive.redrive(root, "dlq")
      val leftInDlq = graft.log.LogStore
        .readRange(root, "dlq", graft.log.LogId(0L, 0L),
          graft.log.LogStore.maxId(root, "dlq"))
        .count(!_.isTombstone).toLong
      import scala.jdk.CollectionConverters._
      processed.asScala.toSeq
        .map(v => (v("event_id").toLong, v("__redrive_of"),
          v("__redrive_attempts").toLong))
        .toDF("event_id", "redrive_of", "attempts_was")
        .groupBy($"event_id")
        .agg(count(lit(1)).as("n_deliveries"),
          min($"attempts_was").as("attempts_was"),
          min($"redrive_of").as("redrive_of"))
        .select($"event_id", $"n_deliveries", $"attempts_was", $"redrive_of",
          lit(leftInDlq).as("n_left_in_dlq"),
          lit(r2.redriven).as("redrive2_n"))
        .orderBy($"event_id")
    },

    q("q404_pending_summary",
      // XPENDING through the engine: a consumer that defers every 'error'
      // and 'signup' event runs once live (delivery 1) and once more so
      // the pending drain redelivers each entry (delivery 2, deferred
      // again) — after which the group's pending-entries snapshot must
      // list EXACTLY those messages, each with 2 recorded delivery
      // attempts and the right source stream. The oracle is the batch
      // statement of which messages must be pending. Idle times are
      // wall-clock and excluded from the checked columns; the PEL is
      // driver-side state by design (it mirrors Redis's, which lives on
      // the server, not in the data path), so materializing the bounded
      // summary from the driver is the operator's contract, not a scale
      // compromise. Fresh scratch roots per run keep replays
      // deterministic; the slice is bounded (event_id < 2000) — a
      // lifecycle probe, same posture as q399.
      """SELECT event_id, CAST(2 AS BIGINT) AS deliveries,
        |  'events' AS stream
        |FROM events WHERE event_type IN ('error', 'signup')
        |  AND event_id < 2000
        |ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      val root = graft.TempDirs.scratch("graft-q404-pel")
      val slice = Tables.load(s, dir, "events")
        .filter($"event_id" < 2000)
        .select((lit(1700000000000L) + $"event_id").as("ms"),
          $"event_id", $"event_type")
      graft.log.LogBulkProducer.produceAt(
        slice, "ms", root, "events", orderCols = Seq("event_id"))
      val cfg = graft.consumer.ConsumerConfig(
        logRoot = root, stream = "events",
        checkpointRoot = graft.TempDirs.scratch("graft-q404-ckpt"),
        groupName = Some("pel_audit"), startPos = "earliest",
        raiseErrors = false)
      val handler: (String, Option[String], String, Map[String, String]) =>
          graft.consumer.HandlerResult = (_, _, _, values) =>
        if (values("event_type") == "error" || values("event_type") == "signup")
          graft.consumer.HandlerResult.Defer
        else graft.consumer.HandlerResult.Ok
      // delivery 1: live batch — the deferrals enter the PEL
      graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, handler, until = _ => true).stop()
      // delivery 2: the restart's pending drain redelivers and re-defers
      val c = graft.consumer.ConsumerRunner
        .runSupervised(s, cfg, handler, until = _ => true)
      c.stop()
      c.pendingSummary()
        .map(p => (p.id.millis - 1700000000000L, p.deliveries.toLong, p.stream))
        .toDF("event_id", "deliveries", "stream")
        .orderBy($"event_id")
    },
  )
}
