package graft.operators

import graft.ColFns._
import graft.QueryDef.q
import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-time analytics over the stream-shaped `events` table (SURVEY.md §2B
  * "streaming event-time"): tumbling / sliding / session windows and as-of
  * ordering. These are the batch twins of the streaming queries in
  * `graft.streaming` — same `window`/`session_window` operators Structured
  * Streaming uses with a watermark, which makes them oracle-checkable here.
  *
  * The reference carries event time only as the entry-id millis prefix
  * (/root/reference/lib/stream.ex:21-23) and delegates all windowing to user
  * handlers; these make it first-class.
  */
object EventTime {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  val defs: Seq[QueryDef] = Seq(

    q("q35_window_tumbling",
      s"""SELECT strftime(CAST(date_trunc('hour', ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
         |  COUNT(*) AS n,
         |  ${dsumSql("value")} AS total
         |FROM events GROUP BY 1 ORDER BY ws""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
        .select(date_format($"w.start", fmt).as("ws"), $"n", $"total")
        .orderBy($"ws")
    },

    q("q36_window_sliding",
      """WITH w AS (
        |  SELECT CAST(to_timestamp((CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 1800 - s.off) * 1800) AS TIMESTAMP) AS wstart,
        |    event_id
        |  FROM events, (SELECT UNNEST([0, 1]) AS off) s
        |)
        |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS ws, COUNT(*) AS n
        |FROM w GROUP BY 1 ORDER BY ws""") { (s, dir) =>
      import s.implicits._
      // 1-hour windows sliding every 30 min: each event lands in exactly 2.
      T(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(date_format($"w.start", fmt).as("ws"), $"n")
        .orderBy($"ws")
    },

    q("q37_session_window",
      """WITH t AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) uts,
        |    CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP))
        |        OVER (PARTITION BY user_id
        |          ORDER BY CAST(ts AS TIMESTAMP), event_id) >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, uts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY uts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM t
        |)
        |SELECT user_id,
        |  strftime(MIN(uts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(date_diff('second', MIN(uts), MAX(uts)) AS BIGINT) AS dur_sec
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""") { (s, dir) =>
      import s.implicits._
      // session_window: events within a 30-min gap merge; the oracle mirrors
      // it with classic gaps-and-islands (break when gap >= 30 min, matching
      // Spark's exclusive session end).
      T(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
        .agg(count(lit(1)).as("n_events"), min($"ts").as("mn"), max($"ts").as("mx"))
        .select($"user_id",
          date_format($"mn", fmt).as("session_start"),
          $"n_events",
          ($"mx".cast("long") - $"mn".cast("long")).as("dur_sec"))
        .orderBy($"user_id", $"session_start")
    },

    q("q121_changelog_compaction",
      // Keyed-changelog compaction — the canonical "stream as a table"
      // pattern (a Redis stream of upserts/deletes materialized to current
      // state): apply ops in id order per key; 'error' acts as the delete
      // tombstone, anything else upserts. One hash aggregation with
      // map-side partial max_by — no window sort, no per-key re-scan; at
      // 100 TB this is a single shuffle of (key, latest-candidate) pairs.
      """WITH last AS (SELECT user_id,
        |    arg_max(event_type, event_id) AS last_type,
        |    arg_max(value, event_id) AS last_value,
        |    MAX(event_id) AS last_event_id
        |  FROM events GROUP BY user_id)
        |SELECT user_id, last_event_id, last_value
        |FROM last WHERE last_type <> 'error' ORDER BY user_id""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "events")
        .groupBy($"user_id")
        .agg(max_by(struct($"event_type", $"value"), $"event_id").as("last"),
          max($"event_id").as("last_event_id"))
        .filter($"last.event_type" =!= "error")
        .select($"user_id", $"last_event_id", $"last.value".as("last_value"))
        .orderBy($"user_id")
    },

    q("q122_user_history",
      // Recent-history feature construction: each user's last 5 event types
      // in reverse chronological order, as an array ready to join onto
      // training examples. The row_number prefilter bounds what the collect
      // ever buffers to 5 rows per user (collect_list alone would buffer
      // each user's full history before truncating); both passes share the
      // one user_id exchange. The oracle surface emits the array joined with
      // '|' — the driver's comparator hashes/sorts column values, and a raw
      // ARRAY<STRING> is unhashable on its side (VERDICT r3 #1); the
      // array-building plan is unchanged, only the output column is
      // canonicalized.
      """SELECT user_id,
        |  array_to_string(list(event_type ORDER BY event_id DESC)[1:5], '|') AS recent
        |FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)
      T(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .groupBy($"user_id")
        .agg(expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)")
          .as("recent_arr"))
        .select($"user_id", array_join($"recent_arr", "|").as("recent"))
        .orderBy($"user_id")
    },

    q("q127_next_event_pairs",
      // Supervised training-pair construction: each event labeled with the
      // user's next event type iff it follows within 30 minutes (the
      // next-action-prediction dataset shape). One window pass per user —
      // shuffle once on user_id, lead() within the sorted partition; the
      // label gate uses whole-second arithmetic (cast-to-long floor ==
      // DuckDB's second-boundary date_diff) per the events-nanos
      // discipline.
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) uts,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) next_type,
        |    LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) next_ts
        |  FROM events)
        |SELECT event_id, event_type,
        |  CASE WHEN date_diff('second', uts, next_ts) <= 1800
        |       THEN next_type END AS label
        |FROM o ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type", $"ts",
          lead($"event_type", 1).over(w).as("next_type"),
          lead($"ts", 1).over(w).as("next_ts"))
        .select($"event_id", $"event_type",
          when($"next_ts".cast("long") - $"ts".cast("long") <= 1800, $"next_type")
            .as("label"))
        .orderBy($"event_id")
    },

    q("q38_asof_join",
      """SELECT e.event_id,
        |  strftime((SELECT MAX(CAST(c.ts AS TIMESTAMP)) FROM events c
        |            WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |              AND c.ts < e.ts),
        |           '%Y-%m-%d %H:%M:%S') AS prev_click
        |FROM events e WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""") { (s, dir) =>
      import s.implicits._
      // As-of join (latest click strictly before each purchase, per user),
      // computed scalably as one partitioned window pass over the unioned
      // event stream — no per-row correlated lookup, no O(n^2) join. This is
      // the 100 TB plan: shuffle once on user_id, sort within partition.
      // Range frame over microseconds, not a row frame: a row frame ordered
      // by (ts, event_id) would admit a click tied on ts with a lower
      // event_id, while the oracle requires c.ts < e.ts strictly.
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
      T(s, dir, "events")
        .withColumn("click_ts", when($"event_type" === "click", $"ts"))
        .withColumn("prev_click_ts", max($"click_ts").over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", date_format($"prev_click_ts", fmt).as("prev_click"))
        .orderBy($"event_id")
    },

    q("q148_scd2_dimension",
      // Slowly-changing-dimension (type 2) build from a change stream — the
      // warehouse twin of q121's changelog compaction: per user, keep only
      // the rows where event_type CHANGED from its predecessor, then stitch
      // validity intervals with LEAD (valid_from = the change, valid_to =
      // the next change, open interval -> is_current). Two window passes
      // over ONE shuffle on user_id — no self-join, no per-row correlated
      // lookup; interval times are integer epoch-micros, exact in both
      // engines. The reference keeps only latest-state in handlers; this is
      // the engine's history-preserving dimension surface.
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |c AS (SELECT user_id, event_type, us, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |ch AS (SELECT user_id, event_type, us, event_id FROM c
        |       WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, us AS valid_from,
        |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS version
        |  FROM ch)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
        |  valid_from, COALESCE(valid_to, CAST(-1 AS BIGINT)) AS valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM v ORDER BY user_id, version""") { (s, dir) =>
      import s.implicits._
      val byTime = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      T(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
        .withColumn("prev", lag($"event_type", 1).over(byTime))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .withColumn("valid_to_n", lead($"us", 1).over(byTime))
        .withColumn("version", row_number().over(byTime).cast("long"))
        .select($"user_id", $"version", $"event_type",
          $"us".as("valid_from"),
          coalesce($"valid_to_n", lit(-1L)).as("valid_to"),
          $"valid_to_n".isNull.as("is_current"))
        .orderBy($"user_id", $"version")
    },

    q("q247_point_in_time_join",
      // Point-in-time (as-of-validity) join against the SCD2 dimension —
      // the feature-store primitive that prevents training leakage: each
      // purchase fact is labeled with the state version that was valid AT
      // its event time, never a later one. Dimension = q148's build
      // (change rows + LEAD validity intervals); the lookup is an EQUI
      // join on user_id with the interval predicate riding it — per-key
      // version lists are bounded by change count, so at 100 TB this is
      // one keyed shuffle, not an interval cross join. Every purchase
      // lands in exactly one non-degenerate interval (intervals partition
      // [first_event, inf) per user; zero-width [t,t) never matches), so
      // the output is exactly fact-sized — the leakage-free row-count
      // invariant the oracle pins.
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |c AS (SELECT user_id, event_type, us, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |ch AS (SELECT user_id, event_type, us, event_id FROM c
        |       WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, us AS valid_from,
        |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS version
        |  FROM ch),
        |f AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, CAST(v.version AS BIGINT) AS version,
        |  v.event_type AS state_at_fact
        |FROM f JOIN v ON v.user_id = f.user_id
        |  AND v.valid_from <= f.us AND (v.valid_to IS NULL OR f.us < v.valid_to)
        |ORDER BY f.event_id""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
        .transform(graft.CacheScope.cached) // dimension source + fact side
      val byTime = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val dim = e
        .withColumn("prev", lag($"event_type", 1).over(byTime))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .withColumn("valid_to", lead($"us", 1).over(byTime))
        .withColumn("version", row_number().over(byTime).cast("long"))
        .select($"user_id".as("d_user_id"), $"version",
          $"event_type".as("state_at_fact"),
          $"us".as("valid_from"), $"valid_to")
      val facts = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"us")
      facts.join(dim, $"user_id" === $"d_user_id" &&
          $"valid_from" <= $"us" &&
          ($"valid_to".isNull || $"us" < $"valid_to"))
        .select($"event_id", $"user_id", $"version", $"state_at_fact")
        .orderBy($"event_id")
    },

    q("q378_leakage_audit",
      // Temporal-leakage audit — the certificate that QUANTIFIES why
      // q247's point-in-time join exists: every purchase fact is labeled
      // both with the state valid AT its event time (the leakage-free
      // join) and with the user's CURRENT state (what a naive latest-
      // snapshot feature join silently uses), and the confusion between
      // the two is rolled up per state pair with an overall leak rate.
      // Every off-diagonal row is a training example whose feature came
      // from the future. Same one user-keyed shuffle as q247 (the naive
      // state is just the dimension's open interval — no extra pass);
      // the rollup is |states|^2-bounded.
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |c AS (SELECT user_id, event_type, us, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |ch AS (SELECT user_id, event_type, us, event_id FROM c
        |       WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, us AS valid_from,
        |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to
        |  FROM ch),
        |nw AS (SELECT user_id, event_type AS state_now FROM v
        |  WHERE valid_to IS NULL),
        |f AS (SELECT user_id, event_id, us FROM e
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT f.event_id, v.event_type AS state_at_fact, nw.state_now
        |  FROM f JOIN v ON v.user_id = f.user_id
        |    AND v.valid_from <= f.us AND (v.valid_to IS NULL OR f.us < v.valid_to)
        |  JOIN nw ON nw.user_id = f.user_id),
        |g AS (SELECT state_at_fact, state_now, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM j GROUP BY 1, 2)
        |SELECT state_at_fact, state_now, n,
        |  state_at_fact <> state_now AS is_leak,
        |  CAST((n * 1000000) // (SUM(n) OVER ()) AS BIGINT) AS share_ppm,
        |  CAST((SUM(CASE WHEN state_at_fact <> state_now THEN n ELSE 0 END)
        |      OVER () * 1000000) // (SUM(n) OVER ()) AS BIGINT)
        |    AS total_leak_ppm
        |FROM g ORDER BY state_at_fact, state_now""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
        .transform(graft.CacheScope.cached) // dimension + fact sides
      val byTime = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val dim = e
        .withColumn("prev", lag($"event_type", 1).over(byTime))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
        .withColumn("valid_to", lead($"us", 1).over(byTime))
        .select($"user_id".as("d_user_id"), $"event_type".as("state_at_fact"),
          $"us".as("valid_from"), $"valid_to")
        .transform(graft.CacheScope.cached) // PIT side + current-state side
      val now = dim.filter($"valid_to".isNull)
        .select($"d_user_id".as("n_user_id"),
          $"state_at_fact".as("state_now"))
      val g = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"us")
        .join(dim, $"user_id" === $"d_user_id" &&
          $"valid_from" <= $"us" &&
          ($"valid_to".isNull || $"us" < $"valid_to"))
        .join(now, $"user_id" === $"n_user_id")
        .groupBy($"state_at_fact", $"state_now")
        .agg(count(lit(1)).as("n"))
      val all = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("tot", sum($"n").over(all))
        .withColumn("leak_tot",
          sum(when($"state_at_fact" =!= $"state_now", $"n").otherwise(0L))
            .over(all))
        .select($"state_at_fact", $"state_now", $"n",
          ($"state_at_fact" =!= $"state_now").as("is_leak"),
          expr("(n * 1000000) div tot").as("share_ppm"),
          expr("(leak_tot * 1000000) div tot").as("total_leak_ppm"))
        .orderBy($"state_at_fact", $"state_now")
    },

    q("q254_cohort_ltv",
      // Cumulative cohort LTV curve — the growth readout next to q228's
      // retention matrix: users cohorted by first-seen day, purchase
      // revenue (exact cents) accumulated by day offset, reported as
      // cohort-level cumulative revenue and integer cents-per-user. The
      // heavy work is two user-keyed aggregations (first-seen + the
      // revenue join-back); the cumulative window runs per cohort over
      // the bounded (cohort x offset) grid — days, not events. LTV is an
      // integer division so no float can flap the curve.
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END cents
        |  FROM events),
        |f AS (SELECT user_id, MIN(day) cday FROM e GROUP BY user_id),
        |cs AS (SELECT cday, CAST(COUNT(*) AS BIGINT) cohort_n FROM f
        |  GROUP BY cday),
        |r AS (SELECT f.cday, (e.day - f.cday) AS offs,
        |    CAST(SUM(e.cents) AS BIGINT) rev
        |  FROM e JOIN f ON f.user_id = e.user_id GROUP BY f.cday, offs),
        |c AS (SELECT cday, offs,
        |    CAST(SUM(rev) OVER (PARTITION BY cday ORDER BY offs) AS BIGINT) cum
        |  FROM r)
        |SELECT c.cday AS cohort_day, CAST(c.offs AS BIGINT) AS day_offset,
        |  cs.cohort_n, c.cum AS cum_rev_cents,
        |  CAST(c.cum // cs.cohort_n AS BIGINT) AS ltv_cents_per_user
        |FROM c JOIN cs ON cs.cday = c.cday
        |ORDER BY cohort_day, day_offset""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "events")
        .select($"user_id", to_date($"ts").as("day"),
          when($"event_type" === "purchase",
            floor($"value" * 100 + 0.5).cast("long")).otherwise(0L)
            .as("cents"))
        .transform(graft.CacheScope.cached) // first-seen + revenue join-back
      val f = e.groupBy($"user_id").agg(min($"day").as("cday"))
      val cs = f.groupBy($"cday").agg(count(lit(1)).as("cohort_n"))
      val r = e.join(f, Seq("user_id"))
        .groupBy($"cday", datediff($"day", $"cday").as("offs"))
        .agg(sum($"cents").as("rev"))
      val c = r.withColumn("cum", sum($"rev")
        .over(Window.partitionBy($"cday").orderBy($"offs")))
      c.join(broadcast(cs), Seq("cday"))
        .select($"cday".as("cohort_day"), $"offs".cast("long").as("day_offset"),
          $"cohort_n", $"cum".as("cum_rev_cents"),
          expr("cum div cohort_n").as("ltv_cents_per_user"))
        .orderBy($"cohort_day", $"day_offset")
    },

    q("q255_stl_decompose",
      // Additive STL-style decomposition of the daily count series:
      // trend = centered 7-day moving average (full windows only),
      // seasonal = per-weekday mean of the detrended series, remainder =
      // what's left — the structural complement of q218's multiplicative
      // index (which day is big) and q243's ACF (is there a cycle at
      // all). Exact integers in milli units throughout; the one floored
      // division (seasonal mean of possibly-NEGATIVE detrended values)
      // uses q179's shift-to-non-negative trick, because Spark's DIV
      // truncates while DuckDB's // floors and they disagree below zero:
      // (sum(x + 1e9·n)/n) − 1e9 floors exactly in both. Weekday =
      // idx % 7 relative to the first day — engine-neutral, no dayofweek
      // dialect skew. All windows run on the zero-filled bounded day grid.
      """WITH c AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY day),
        |b AS (SELECT MIN(day) lo, MAX(day) hi FROM c),
        |days AS (SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |g AS (SELECT days.day, COALESCE(c.n, 0) AS n
        |  FROM days LEFT JOIN c ON c.day = days.day),
        |ix AS (SELECT day, n,
        |    ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx FROM g),
        |tr AS (SELECT idx, n,
        |    (1000 * SUM(n) OVER (ORDER BY idx
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) // 7 AS trend_mi,
        |    COUNT(*) OVER (ORDER BY idx
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        |  FROM ix),
        |dt AS (SELECT idx, n, trend_mi,
        |    1000 * n - trend_mi AS detr_mi, idx % 7 AS dow
        |  FROM tr WHERE wn = 7),
        |se AS (SELECT dow,
        |    (SUM(detr_mi + 1000000000) // COUNT(*)) - 1000000000 AS seas_mi
        |  FROM dt GROUP BY dow)
        |SELECT CAST(dt.idx AS BIGINT) AS idx, dt.n,
        |  CAST(dt.trend_mi AS BIGINT) AS trend_milli,
        |  CAST(se.seas_mi AS BIGINT) AS seasonal_milli,
        |  CAST(dt.detr_mi - se.seas_mi AS BIGINT) AS resid_milli
        |FROM dt JOIN se ON se.dow = dt.dow ORDER BY idx""") { (s, dir) =>
      import s.implicits._
      val c = T(s, dir, "events")
        .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.cached)
      val b = c.agg(min($"day").as("lo"), max($"day").as("hi"))
      val days = b.select(explode(expr(
        "sequence(lo, hi, interval 1 day)")).as("day"))
      val g = days.join(c, Seq("day"), "left")
        .select($"day", coalesce($"n", lit(0L)).as("n"))
      val ix = g.withColumn("idx",
        row_number().over(Window.orderBy($"day")) - 1)
      val w7 = Window.orderBy($"idx").rowsBetween(-3, 3)
      val dt2 = ix
        .withColumn("n_sum", sum($"n").over(w7))
        .withColumn("wn", count(lit(1)).over(w7))
        .filter($"wn" === 7)
        .withColumn("trend_mi", expr("(1000 * n_sum) div 7"))
        .withColumn("detr_mi", lit(1000L) * $"n" - $"trend_mi")
        .withColumn("dow", $"idx" % 7)
      val se = dt2.groupBy($"dow")
        .agg(((sum($"detr_mi" + 1000000000L)).cast("long")).as("sd"),
          count(lit(1)).as("cnt"))
        .select($"dow", (expr("sd div cnt") - 1000000000L).as("seas_mi"))
      dt2.join(broadcast(se), Seq("dow"))
        .select($"idx".cast("long").as("idx"), $"n",
          $"trend_mi".cast("long").as("trend_milli"),
          $"seas_mi".cast("long").as("seasonal_milli"),
          ($"detr_mi" - $"seas_mi").cast("long").as("resid_milli"))
        .orderBy($"idx")
    },

    q("q256_time_to_convert",
      // Click-to-purchase latency histogram — the distribution behind
      // q227's funnel rates (HOW FAST do converters convert, which sets
      // any attribution window honestly): each click finds the user's
      // next purchase with ONE reverse-running-min window over the
      // user-keyed ordering (no self-join, no interval join), latencies
      // under 24 h bucket into fixed integer edges. One shuffle on
      // user_id; counts are exact.
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |n AS (SELECT user_id, event_type, us,
        |    MIN(CASE WHEN event_type = 'purchase' THEN us END) OVER (
        |      PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM e),
        |c AS (SELECT np - us AS lat FROM n
        |  WHERE event_type = 'click' AND np IS NOT NULL
        |    AND np - us < 86400000000)
        |SELECT CASE WHEN lat < 60000000 THEN '0_under_1m'
        |    WHEN lat < 600000000 THEN '1_1m_10m'
        |    WHEN lat < 3600000000 THEN '2_10m_1h'
        |    ELSE '3_1h_24h' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM c GROUP BY bucket ORDER BY bucket""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
      val fut = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      e.withColumn("np",
          min(when($"event_type" === "purchase", $"us")).over(fut))
        .filter($"event_type" === "click" && $"np".isNotNull &&
          $"np" - $"us" < 86400000000L)
        .select(($"np" - $"us").as("lat"))
        .select(when($"lat" < 60000000L, "0_under_1m")
          .when($"lat" < 600000000L, "1_1m_10m")
          .when($"lat" < 3600000000L, "2_10m_1h")
          .otherwise("3_1h_24h").as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },

    q("q194_markov_transitions",
      // First-order Markov transition matrix over per-user event sequences:
      // P(next=to | cur=from) in integer MICRO units (one non-negative DIV
      // per row — no float division to diverge between engines). DuckDB's
      // SUM(BIGINT) widens to HUGEINT, so the quotient is cast back.
      """WITH v AS (SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id
        |  FROM events),
        |n AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tsu, event_id) AS to_type
        |  FROM v),
        |p AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        |  FROM n WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n_trans,
        |  CAST((n_trans * 1000000)
        |    // SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS prob_micro
        |FROM p ORDER BY from_type, to_type""") { (s, dir) =>
      import s.implicits._
      // The sequence-model training signal behind next-event prediction and
      // session simulators: count from->to adjacencies per user timeline,
      // normalize per source state. One user-keyed window (same (tsu,
      // event_id) tie-break discipline as q174/q185), one (from, to) keyed
      // aggregation — both partial-aggregate map-side — and a final window
      // over the #states^2-row matrix, which is trivially small however big
      // the corpus is. At 100 TB the only material shuffle is the user_id
      // exchange the window needs; everything after runs on state-pair
      // granularity.
      val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
      T(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tsu"),
          $"event_id")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n_trans"))
        .withColumn("prob_micro", expr(
          "(n_trans * 1000000) DIV SUM(n_trans) OVER (PARTITION BY from_type)"))
        .orderBy($"from_type", $"to_type")
    },

    q("q198_session_paths",
      // Top-20 most common 3-event paths WITHIN a session (30-min
      // inactivity gap, q37's sessionization rule): sessionize via a
      // gap-marker running sum, slide a length-3 window with two LEADs,
      // count path triples. Ties break lexicographically so the top-20 cut
      // is deterministic in both engines.
      """WITH v AS (SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id
        |  FROM events),
        |g AS (SELECT user_id, event_type, tsu, event_id,
        |    CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id
        |        ORDER BY tsu, event_id) > 1800000000
        |      OR LAG(tsu) OVER (PARTITION BY user_id
        |        ORDER BY tsu, event_id) IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM v),
        |sd AS (SELECT user_id, event_type, tsu, event_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY tsu, event_id) AS sess_id
        |  FROM g),
        |p AS (SELECT event_type AS e1,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id, sess_id
        |      ORDER BY tsu, event_id) AS e2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id, sess_id
        |      ORDER BY tsu, event_id) AS e3
        |  FROM sd)
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM p WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
        |ORDER BY n_paths DESC, e1, e2, e3 LIMIT 20""") { (s, dir) =>
      import s.implicits._
      // Open-ended path mining — "what do users actually DO in a session"
      // — the exploratory complement to q112's fixed funnel (which counts
      // ONE prescribed sequence). All three windows ride the same user_id
      // exchange (the session re-partition adds sess_id to the KEY but not
      // a new shuffle — Spark reuses the user_id exchange since
      // (user_id, sess_id) is partition-prefix-compatible); the path count
      // partial-aggregates map-side and the top-20 is
      // TakeOrderedAndProject, never a global sort. At 100 TB the only
      // material exchange is the per-user one every sessionization pays.
      val byU = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
      val sess = T(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tsu"),
          $"event_id")
        .withColumn("prev_tsu", lag($"tsu", 1).over(byU))
        .withColumn("new_sess",
          when($"prev_tsu".isNull || $"tsu" - $"prev_tsu" > 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess_id", sum($"new_sess").over(byU))
      val byS = Window.partitionBy($"user_id", $"sess_id")
        .orderBy($"tsu", $"event_id")
      sess
        .select($"event_type".as("e1"),
          lead($"event_type", 1).over(byS).as("e2"),
          lead($"event_type", 2).over(byS).as("e3"))
        .filter($"e3".isNotNull)
        .groupBy($"e1", $"e2", $"e3")
        .agg(count(lit(1)).as("n_paths"))
        .orderBy($"n_paths".desc, $"e1", $"e2", $"e3")
        .limit(20)
    },

    q("q203_churn_labels",
      // Per-user churn label + activity features: inactive > 14 days at the
      // corpus horizon = churned. All integer (day arithmetic + counts);
      // the 1-row horizon is broadcast.
      """WITH v AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type
        |  FROM events),
        |mx AS (SELECT MAX(day) AS mday FROM v),
        |u AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |    CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days,
        |    MAX(day) AS last_day
        |  FROM v GROUP BY user_id)
        |SELECT user_id, n_events, n_types, active_days,
        |  CAST(mday - last_day AS BIGINT) AS days_inactive,
        |  (mday - last_day) > 14 AS churned
        |FROM u, mx ORDER BY user_id""") { (s, dir) =>
      import s.implicits._
      // The label-generation pass of a churn model: one user-keyed
      // aggregation produces the label AND the feature row in the same
      // shuffle (last-seen recency, volume, breadth, active days) — no
      // second pass over the corpus for features. The corpus horizon
      // (max day) is a 1-row broadcast; the churn threshold is integer day
      // arithmetic, so the boolean cannot flap. At 100 TB this is exactly
      // one exchange on user_id; the two count-distincts stay bounded
      // (#types, #days) per user.
      val v = T(s, dir, "events")
        .select($"user_id", to_date($"ts").as("day"), $"event_type")
      val mx = v.agg(max($"day").as("mday"))
      v.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"event_type").as("n_types"),
          countDistinct($"day").as("active_days"),
          max($"day").as("last_day"))
        .crossJoin(broadcast(mx))
        .select($"user_id", $"n_events", $"n_types", $"active_days",
          datediff($"mday", $"last_day").cast("long").as("days_inactive"),
          (datediff($"mday", $"last_day") > 14).as("churned"))
        .orderBy($"user_id")
    },

    q("q204_cumulative_reach",
      // Growth-accounting series: DAU, new users, and cumulative distinct
      // reach per day. Cumulative distinct WITHOUT a running dedup: each
      // user collapses to a first-seen day once, then a running sum over
      // the day-sized series — the only way the metric scales.
      """WITH v AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM v GROUP BY day),
        |fs AS (SELECT user_id, MIN(day) AS first_day FROM v GROUP BY user_id),
        |nu AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        |  FROM fs GROUP BY first_day)
        |SELECT d.day, d.dau, COALESCE(n.new_users, 0) AS new_users,
        |  CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT)
        |    AS cum_users
        |FROM dau d LEFT JOIN nu n ON d.day = n.day
        |ORDER BY d.day""") { (s, dir) =>
      import s.implicits._
      // The dashboard triple behind every launch review. The distinct
      // (day, user) pre-aggregation carries both downstream metrics; the
      // first-seen table is the cumulative-distinct trick (min-day per
      // user, then count per day) — no day-over-day set union, state is
      // one row per user then one per day. The final running sum windows
      // over a day-cardinality series: trivially small forever. Two
      // keyed shuffles (day+user distinct, then user min) — both partial
      // map-side.
      val v = T(s, dir, "events")
        .select(to_date($"ts").as("day"), $"user_id").distinct()
        .transform(graft.CacheScope.cached)
      val dau = v.groupBy($"day").agg(count(lit(1)).as("dau"))
      val nu = v.groupBy($"user_id").agg(min($"day").as("first_day"))
        .groupBy($"first_day".as("day")).agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(nu, Seq("day"), "left")
        .withColumn("new_users", coalesce($"new_users", lit(0L)))
        .withColumn("cum_users", sum($"new_users").over(w))
        .select($"day", $"dau", $"new_users", $"cum_users")
        .orderBy($"day")
    },

    q("q207_gap_fill",
      // Dense (event_type x day) grid: sequence over the corpus day span,
      // cross the bounded type dimension, left-join observed counts,
      // zero-fill — downstream windows (lag/moving averages) then see a
      // complete series instead of silently skipping missing days.
      """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM c),
        |days AS (SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |grid AS (SELECT t.event_type, days.day
        |  FROM (SELECT DISTINCT event_type FROM c) t, days)
        |SELECT g.event_type, g.day, COALESCE(c.n, 0) AS n,
        |  (c.n IS NULL) AS filled
        |FROM grid g LEFT JOIN c ON g.event_type = c.event_type
        |  AND g.day = c.day
        |ORDER BY g.event_type, g.day""") { (s, dir) =>
      import s.implicits._
      // Gap filling — the repair q99's forward-fill can't do (it fixes
      // null VALUES; missing ROWS need the grid). The grid is generated,
      // not scanned: day span from a 1-row bounds aggregate, types from a
      // bounded-cardinality distinct, crossed while both are broadcast-
      // small; observed counts then LEFT-join the grid on (type, day).
      // At 100 TB the grid is #types x #days rows — independent of event
      // volume — and the one material shuffle is the pre-aggregation of
      // counts.
      val c = T(s, dir, "events")
        .select($"event_type", to_date($"ts").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.cached)
      val b = c.agg(min($"day").as("lo"), max($"day").as("hi"))
      val days = b.select(explode(expr(
        "sequence(lo, hi, interval 1 day)")).as("day"))
      val grid = c.select($"event_type").distinct().crossJoin(broadcast(days))
      grid.as("g").join(c.as("o"),
          $"g.event_type" === $"o.event_type" && $"g.day" === $"o.day", "left")
        .select($"g.event_type", $"g.day",
          coalesce($"o.n", lit(0L)).as("n"),
          $"o.n".isNull.as("filled"))
        .orderBy($"g.event_type", $"g.day")
    },

    q("q208_ab_readout",
      // Deterministic variant split (user_id parity), per-user conversion
      // collapse, per-variant rates in integer PPM, lift as one subtraction
      // — the whole readout is integer-exact.
      """WITH u AS (SELECT user_id, user_id % 2 AS variant,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted
        |  FROM events GROUP BY user_id),
        |v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(converted) AS BIGINT) AS n_conv
        |  FROM u GROUP BY variant),
        |p AS (SELECT
        |    MAX(CASE WHEN variant = 0 THEN n_users END) AS users_a,
        |    MAX(CASE WHEN variant = 1 THEN n_users END) AS users_b,
        |    MAX(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
        |    MAX(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
        |  FROM v)
        |SELECT users_a, users_b, conv_a, conv_b,
        |  (conv_a * 1000000) // users_a AS cr_a_ppm,
        |  (conv_b * 1000000) // users_b AS cr_b_ppm,
        |  (conv_b * 1000000) // users_b - (conv_a * 1000000) // users_a
        |    AS lift_ppm
        |FROM p""") { (s, dir) =>
      import s.implicits._
      // The experiment-readout query every growth team runs: unit of
      // analysis is the USER (converted = did the user EVER purchase —
      // the per-user collapse prevents heavy users from double-counting),
      // variants split by a deterministic id hash. Two keyed aggregations
      // (user, then 2-row variant) and a 1-row pivot; at 100 TB the only
      // material exchange is the user collapse, which partial-aggregates
      // map-side. The PPM rates and lift are integer DIV/subtraction, so
      // the sign of the lift cannot flap on a float edge.
      val u = T(s, dir, "events")
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase", 1).otherwise(0))
          .cast("long").as("converted"))
        .withColumn("variant", $"user_id" % 2)
      u.groupBy($"variant")
        .agg(count(lit(1)).as("n_users"), sum($"converted").as("n_conv"))
        .agg(
          max(when($"variant" === 0, $"n_users")).as("users_a"),
          max(when($"variant" === 1, $"n_users")).as("users_b"),
          max(when($"variant" === 0, $"n_conv")).as("conv_a"),
          max(when($"variant" === 1, $"n_conv")).as("conv_b"))
        .select($"users_a", $"users_b", $"conv_a", $"conv_b",
          expr("(conv_a * 1000000) DIV users_a").as("cr_a_ppm"),
          expr("(conv_b * 1000000) DIV users_b").as("cr_b_ppm"),
          expr("(conv_b * 1000000) DIV users_b - (conv_a * 1000000) DIV users_a")
            .as("lift_ppm"))
    },

    q("q218_seasonal_index",
      // Day-of-week seasonal indices per event type: mean(dow) / mean(all)
      // from integer cent sums, one trailing IEEE expression per row.
      // Spark's dayofweek is 1-7 (Sun=1), DuckDB's 0-6 (Sun=0) — the Spark
      // side subtracts 1 so both emit 0=Sunday.
      s"""WITH e AS (SELECT event_type, dayofweek(ts) AS dow,
         |    CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS vc
         |  FROM events),
         |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_tot,
         |    CAST(SUM(vc) AS BIGINT) AS sum_tot FROM e GROUP BY 1),
         |d AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(vc) AS BIGINT) AS sum_c FROM e GROUP BY 1, 2)
         |SELECT d.event_type, CAST(d.dow AS BIGINT) AS dow, cnt, sum_c,
         |  ${r6Sql("(CAST(sum_c AS DOUBLE) * CAST(n_tot AS DOUBLE)) / (CAST(cnt AS DOUBLE) * CAST(sum_tot AS DOUBLE))")} AS seasonal_idx
         |FROM d JOIN t USING (event_type) ORDER BY event_type, dow""") { (s, dir) =>
      import s.implicits._
      // The multiplicative seasonal-decomposition readout (index > 1 =
      // that weekday runs hot) — what a forecasting/capacity pass computes
      // before de-seasonalizing. Two keyed aggregations on one scan; the
      // per-type totals (|types| rows) broadcast onto the (type, dow)
      // cells. Values pre-normalized to integer cents so every sum is
      // exact; the index is one IEEE mul/div chain, r6-rounded.
      val e = T(s, dir, "events").select($"event_type",
        (dayofweek($"ts") - 1).as("dow"),
        expr("CAST(FLOOR(value*100 + 0.5) AS BIGINT)").as("vc"))
      val t = e.groupBy($"event_type")
        .agg(count(lit(1)).as("n_tot"), sum($"vc").as("sum_tot"))
      val d = e.groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("cnt"), sum($"vc").as("sum_c"))
      d.join(broadcast(t), Seq("event_type"))
        .select($"event_type", $"dow".cast("long").as("dow"), $"cnt", $"sum_c",
          r6(($"sum_c".cast("double") * $"n_tot".cast("double")) /
            ($"cnt".cast("double") * $"sum_tot".cast("double")))
            .as("seasonal_idx"))
        .orderBy($"event_type", $"dow")
    },

    q("q227_funnel_conversion",
      // Ordered 3-step funnel (view -> click -> purchase): a user reaches
      // step k only via a strictly-later event than their step-k-1 time.
      // Chained MIN-ts semantics — the standard "first conversion path"
      // definition, immune to event multiplicity, and STRICTER than q112's
      // first-occurrence comparison (q112 compares the global first times,
      // which misses a later re-view completing the chain; the chained min
      // re-anchors each step on the previous step's time). conv_ppm is an
      // integer DIV against the step-1 population. q233 runs this same
      // contract THROUGH the streaming engine.
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
      // The conversion-funnel primitive of product analytics. Every stage
      // is one aggregation + one equi-join ON THE SAME user_id key, so at
      // 100 TB the whole chain rides a single hash-partitioning of the
      // events scan (exchange reuse across stages); per-stage frames
      // shrink monotonically (only converting users survive). No window
      // sort over the raw event stream — the chained-min formulation
      // aggregates before it joins.
      val ev = T(s, dir, "events").select($"user_id", $"ts", $"event_type")
      def step(src: DataFrame, prev: DataFrame, et: String, tPrev: String,
          tOut: String): DataFrame =
        src.filter($"event_type" === et)
          .join(prev, Seq("user_id"))
          .filter($"ts" > col(tPrev))
          .groupBy($"user_id").agg(min($"ts").as(tOut))
      val s1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = step(ev, s1, "click", "t1", "t2")
      val s3 = step(ev, s2, "purchase", "t2", "t3")
      val counts = s1.agg(count(lit(1)).as("users_reached"))
        .select(lit(1L).as("step"), lit("view").as("step_name"), $"users_reached")
        .unionAll(s2.agg(count(lit(1)).as("u"))
          .select(lit(2L), lit("click"), $"u"))
        .unionAll(s3.agg(count(lit(1)).as("u"))
          .select(lit(3L), lit("purchase"), $"u"))
      val base = counts.filter($"step" === 1L)
        .select($"users_reached".as("u1"))
      counts.crossJoin(broadcast(base))
        .select($"step", $"step_name", $"users_reached",
          expr("(users_reached * 1000000) DIV u1").as("conv_ppm"))
        .orderBy($"step")
    },

    q("q228_retention_matrix",
      // Day-N cohort retention: users grouped by first-seen day,
      // re-activity counted per day offset (0..13), each cell NORMALIZED
      // by its cohort's day-0 size (retention_ppm, integer DIV) — the
      // dashboard-ready complement of q113's raw weekly cohort counts
      // (daily granularity, rate not count, bounded horizon).
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort_day,
        |    CAST(ts AS DATE) - cohort_day AS offset_days
        |  FROM events e JOIN f ON f.user_id = e.user_id
        |  WHERE CAST(ts AS DATE) - cohort_day BETWEEN 0 AND 13),
        |m AS (SELECT cohort_day, CAST(offset_days AS BIGINT) AS offset_days,
        |    CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM a GROUP BY cohort_day, offset_days),
        |c0 AS (SELECT cohort_day, n_users AS cohort_size FROM m
        |  WHERE offset_days = 0)
        |SELECT m.cohort_day, m.offset_days, m.n_users,
        |  m.n_users * 1000000 // c0.cohort_size AS retention_ppm
        |FROM m JOIN c0 ON c0.cohort_day = m.cohort_day
        |ORDER BY m.cohort_day, m.offset_days""") { (s, dir) =>
      import s.implicits._
      // The day-N retention matrix every growth dashboard is built on.
      // Two user_id-keyed steps (first-seen agg, then the activity join)
      // share one partitioning; the (cohort, offset) matrix is tiny
      // (#days x 14) so the day-0 self-join is broadcast. The 0..13
      // offset cap bounds output and state regardless of corpus span —
      // the knob that keeps this shape fixed-size at 100 TB.
      val ev = T(s, dir, "events")
        .select($"user_id", to_date($"ts").as("day"))
      val f = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      val a = ev.join(f, Seq("user_id"))
        .withColumn("offset_days", datediff($"day", $"cohort_day"))
        .filter($"offset_days".between(0, 13))
        .select($"user_id", $"cohort_day", $"offset_days").distinct()
      val m = a.groupBy($"cohort_day", $"offset_days".cast("long").as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
      val c0 = m.filter($"offset_days" === 0L)
        .select($"cohort_day", $"n_users".as("cohort_size"))
      m.join(broadcast(c0), Seq("cohort_day"))
        .select($"cohort_day", $"offset_days", $"n_users",
          expr("(n_users * 1000000) DIV cohort_size").as("retention_ppm"))
        .orderBy($"cohort_day", $"offset_days")
    },

    q("q232_cusum_changepoint",
      // One-sided CUSUM over daily counts, recursion-free: S_t =
      // (C_t - C_min-so-far) where C is the running sum of (cnt*1e6 - k)
      // and k is the per-type mean daily count in micro units — the
      // prefix-sum-minus-running-min identity turns max(0, S+x) recursion
      // into two windows. Alarm when the cumulative excess tops one full
      // mean day (h = k). All integer micro arithmetic; deviations go
      // negative but are only ever summed.
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |k AS (SELECT event_type,
        |    SUM(cnt) * 1000000 // COUNT(*) AS k_micro FROM d GROUP BY 1),
        |c AS (SELECT d.event_type, day, cnt, k_micro,
        |    SUM(cnt * 1000000 - k_micro) OVER (PARTITION BY d.event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum
        |  FROM d JOIN k ON k.event_type = d.event_type),
        |sx AS (SELECT event_type, day, cnt, k_micro, cum,
        |    cum - LEAST(COALESCE(MIN(cum) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0), 0) AS s
        |  FROM c)
        |SELECT event_type,
        |  MIN(CASE WHEN s > k_micro THEN day END) AS first_alarm_day,
        |  CAST(MAX(s) AS BIGINT) AS max_s_micro,
        |  CAST(SUM(CASE WHEN s > k_micro THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarm_days
        |FROM sx GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      import s.implicits._
      // Level-shift detection on a metric stream (complement of q214's
      // spike detector: CUSUM accumulates small sustained drifts a
      // trailing-mean test never trips on). The day table is
      // aggregate-sized, the per-type mean broadcasts back, both windows
      // and the final rollup share the event_type partitioning — one real
      // shuffle over the raw corpus, window work on #days-sized frames.
      val d = T(s, dir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val k = d.groupBy($"event_type")
        .agg(expr("(SUM(cnt) * 1000000) DIV COUNT(*)").as("k_micro"))
      val wCum = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMin = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sx = d.join(broadcast(k), Seq("event_type"))
        .withColumn("cum", sum($"cnt" * 1000000L - $"k_micro").over(wCum))
        .withColumn("s",
          $"cum" - least(coalesce(min($"cum").over(wMin), lit(0L)), lit(0L)))
      sx.groupBy($"event_type")
        .agg(
          min(when($"s" > $"k_micro", $"day")).as("first_alarm_day"),
          max($"s").cast("long").as("max_s_micro"),
          sum(when($"s" > $"k_micro", 1L).otherwise(0L)).cast("long")
            .as("n_alarm_days"))
        .orderBy($"event_type")
    },

    q("q267_rolling_wau",
      // Rolling 7-day active users (WAU) + same-day DAU + stickiness —
      // the engagement ratio every growth dashboard carries. A windowed
      // COUNT(DISTINCT) over a sliding range doesn't distribute; the
      // scalable identity is coverage expansion: each (user, active-day)
      // covers the 7 report days [d, d+6], so WAU(day) = distinct users
      // covering it. That is a fixed 7x fan-out of the ALREADY-collapsed
      // per-user-day table (never the raw corpus) followed by one keyed
      // distinct — two bounded shuffles, no window-distinct, the same
      // collapse-then-count shape as q204's cumulative reach. Only days
      // with a full 7-day lookback inside the observed span are emitted
      // (the ramp-up rows would understate WAU).
      """WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
        |  FROM events),
        |b AS (SELECT MIN(day) AS mind FROM a),
        |cov AS (SELECT DISTINCT u, day + CAST(t.o AS INTEGER) AS cd
        |  FROM a, range(0, 7) t(o)),
        |w AS (SELECT cd, CAST(COUNT(*) AS BIGINT) AS wau FROM cov
        |  GROUP BY cd),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM a
        |  GROUP BY day)
        |SELECT dau.day, dau.dau, w.wau,
        |  CAST((1000000 * dau.dau) // w.wau AS BIGINT) AS stickiness_ppm
        |FROM dau JOIN w ON w.cd = dau.day, b
        |WHERE dau.day >= b.mind + 6
        |ORDER BY day""") { (s, dir) =>
      import s.implicits._
      val a = T(s, dir, "events")
        .select($"user_id".as("u"), to_date($"ts").as("day")).distinct()
        .transform(graft.CacheScope.cached) // feeds coverage + DAU + span
      val b = a.agg(min($"day").as("mind"))
      val w = a
        .withColumn("o", explode(expr("sequence(0, 6)")))
        .select($"u", expr("date_add(day, o)").as("cd")).distinct()
        .groupBy($"cd").agg(count(lit(1)).as("wau"))
      val dau = a.groupBy($"day").agg(count(lit(1)).as("dau"))
      dau.join(w, dau("day") === w("cd"))
        .crossJoin(broadcast(b))
        .filter($"day" >= expr("date_add(mind, 6)"))
        .select($"day", $"dau", $"wau",
          expr("(1000000 * dau) div wau").as("stickiness_ppm"))
        .orderBy($"day")
    },

    q("q287_rate_limit_audit",
      // Abuse / rate-limit audit: the top-20 heaviest (user, day) activity
      // cells with an over-limit flag (>= 8 events/day on this fixture's
      // traffic shape) — the who-is-hammering-us readout a throttling
      // policy is tuned against. One keyed aggregation over the raw
      // events, then TakeOrderedAndProject with a fully deterministic
      // (count desc, user, day) cut; emitting the top-k rather than only
      // violators keeps the readout non-empty at any scale (q214's
      // lesson) while the flag carries the policy decision.
      """WITH b AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id, day)
        |SELECT user_id, day, n_events, n_events >= 8 AS over_limit
        |FROM b ORDER BY n_events DESC, user_id, day LIMIT 20""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "events")
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"day", $"n_events",
          ($"n_events" >= 8).as("over_limit"))
        .orderBy($"n_events".desc, $"user_id", $"day").limit(20)
    },

    q("q292_cep_pattern",
      // Complex-event-processing pattern match: click FOLLOWED BY purchase
      // within 30 minutes with NO error in between — the A-then-B-unless-C
      // primitive CEP engines (Flink MATCH_RECOGNIZE) own, expressed as
      // ONE window pass: per user in (ts, event_id) order, running "last
      // click micros" and "last error micros" carried by conditional MAX
      // windows; each purchase row then decides the pattern locally. No
      // self-join, no per-pattern state machine — the whole match is one
      // user-keyed shuffle, which is the 100 TB shape (q227's funnel
      // discipline applied to a guarded pattern). Per-user match counts +
      // tightest gap; users with zero matches are dropped (match-sized
      // output).
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
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      T(s, dir, "events")
        .select($"user_id", $"event_type", $"event_id", $"ts",
          expr("unix_micros(ts)").as("us"))
        .withColumn("last_click",
          max(when($"event_type" === "click", expr("unix_micros(ts)")))
            .over(w))
        .withColumn("last_error",
          max(when($"event_type" === "error", expr("unix_micros(ts)")))
            .over(w))
        .filter($"event_type" === "purchase" && $"last_click".isNotNull &&
          $"us" - $"last_click" <= 1800000000L &&
          ($"last_error".isNull || $"last_error" < $"last_click"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_matches"),
          min($"us" - $"last_click").as("min_gap_us"))
        .orderBy($"user_id")
    },

    q("q294_rolling_corr",
      // Rolling 7-day correlation between two event types' daily volumes —
      // the co-movement monitor behind "did clicks decouple from
      // purchases this week". Exact integer moments per 7-row window over
      // the ZERO-FILLED day grid (q207's repair first: a missing day must
      // enter as 0, not be skipped); correlation is one trailing IEEE
      // chain per emitted day, identical op-for-op. Only full windows
      // with nonzero variance on both sides emit. All windows run on the
      // bounded day domain.
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
        |grid AS (SELECT unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY))::DATE AS day FROM b),
        |z AS (SELECT g.day, COALESCE(d.x, 0) AS x, COALESCE(d.y, 0) AS y
        |  FROM grid g LEFT JOIN d ON d.day = g.day),
        |w AS (SELECT day,
        |    ROW_NUMBER() OVER (ORDER BY day) AS rk,
        |    SUM(x) OVER w7 AS sx, SUM(y) OVER w7 AS sy,
        |    SUM(x*y) OVER w7 AS sxy, SUM(x*x) OVER w7 AS sxx,
        |    SUM(y*y) OVER w7 AS syy
        |  FROM z WINDOW w7 AS (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
        |  CAST(FLOOR(CAST(7*sxy - sx*sy AS DOUBLE)
        |    / sqrt(CAST(7*sxx - sx*sx AS DOUBLE)
        |           * CAST(7*syy - sy*sy AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS corr_ppm
        |FROM w WHERE rk >= 7 AND 7*sxx - sx*sx > 0 AND 7*syy - sy*sy > 0
        |ORDER BY day""") { (s, dir) =>
      import s.implicits._
      val d = T(s, dir, "events")
        .groupBy(to_date($"ts").as("day"))
        .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("x"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("y"))
      val b = d.agg(min($"day").as("lo"), max($"day").as("hi"))
      val grid = b.select(explode(expr(
        "sequence(lo, hi, interval 1 day)")).as("day"))
      val z = grid.join(d, Seq("day"), "left")
        .withColumn("x", coalesce($"x", lit(0L)))
        .withColumn("y", coalesce($"y", lit(0L)))
      val w7 = Window.orderBy($"day").rowsBetween(-6, 0)
      val wr = Window.orderBy($"day")
      z.withColumn("rk", row_number().over(wr))
        .withColumn("sx", sum($"x").over(w7))
        .withColumn("sy", sum($"y").over(w7))
        .withColumn("sxy", sum($"x" * $"y").over(w7))
        .withColumn("sxx", sum($"x" * $"x").over(w7))
        .withColumn("syy", sum($"y" * $"y").over(w7))
        .filter($"rk" >= 7 &&
          lit(7) * $"sxx" - $"sx" * $"sx" > 0 &&
          lit(7) * $"syy" - $"sy" * $"sy" > 0)
        .select($"day", $"sx".as("sum_x"), $"sy".as("sum_y"),
          expr("CAST(FLOOR(CAST(7*sxy - sx*sy AS DOUBLE) " +
            "/ sqrt(CAST(7*sxx - sx*sx AS DOUBLE) " +
            "* CAST(7*syy - sy*sy AS DOUBLE)) " +
            "* 1000000.0 + 0.5) AS BIGINT)").as("corr_ppm"))
        .orderBy($"day")
    },

    q("q308_backfill_plan",
      // Backfill planner: per event type, how many days of the corpus
      // span are missing entirely and how many rows a backfill should
      // expect (missing days x the type's observed daily average) — the
      // work-order list q235's partition backfill executes. The expected
      // grid comes from the span boundaries (broadcast), presence from
      // the one (type, day) aggregation, and the whole report runs on
      // type-sized rows.
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
        |sp AS (SELECT CAST(date_diff('day', lo, hi) + 1 AS BIGINT)
        |    AS n_days FROM b),
        |a AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_present,
        |    CAST(SUM(n) AS BIGINT) AS n_rows
        |  FROM d GROUP BY event_type)
        |SELECT a.event_type, sp.n_days AS n_expected_days, a.n_present,
        |  sp.n_days - a.n_present AS n_missing,
        |  CAST((sp.n_days - a.n_present) * (a.n_rows // a.n_present)
        |    AS BIGINT) AS est_backfill_rows
        |FROM a, sp ORDER BY a.event_type""") { (s, dir) =>
      import s.implicits._
      val d = T(s, dir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.cached) // span + per-type rollup
      val sp = d.agg(min($"day").as("lo"), max($"day").as("hi"))
        .select((datediff($"hi", $"lo") + 1).cast("long").as("n_days"))
      d.groupBy($"event_type")
        .agg(count(lit(1)).as("n_present"), sum($"n").as("n_rows"))
        .crossJoin(broadcast(sp))
        .select($"event_type", $"n_days".as("n_expected_days"),
          $"n_present", ($"n_days" - $"n_present").as("n_missing"),
          expr("(n_days - n_present) * (n_rows div n_present)")
            .as("est_backfill_rows"))
        .orderBy($"event_type")
    },

    q("q310_bot_regularity",
      // Automation / bot detection by inter-arrival regularity: humans
      // burst and idle, schedulers tick — so a LOW squared coefficient of
      // variation of the gap series is the bot signal. Per user (>= 10
      // events), CV² in ppm from exact moments: (n·Σd² − (Σd)²) / (Σd)²,
      // cross-multiplied and widened through DECIMAL(38,0)/HUGEINT (gap
      // sums in micros square past BIGINT). One LAG window on the user
      // ordering + one keyed aggregation; top-20 most regular via
      // TakeOrderedAndProject with the < 0.1 CV² flag riding along.
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS d
        |  FROM events),
        |m AS (SELECT user_id, CAST(COUNT(d) AS HUGEINT) AS n,
        |    CAST(SUM(d) AS HUGEINT) AS sd,
        |    CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS ssd
        |  FROM g WHERE d IS NOT NULL GROUP BY user_id
        |  HAVING COUNT(d) >= 9)
        |SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
        |  CAST((1000000 * (n * ssd - sd * sd)) // (sd * sd) AS BIGINT)
        |    AS cv2_ppm,
        |  (1000000 * (n * ssd - sd * sd)) // (sd * sd) < 100000
        |    AS bot_like
        |FROM m ORDER BY cv2_ppm, user_id LIMIT 20""") { (s, dir) =>
      import s.implicits._
      val D = "DECIMAL(38,0)"
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T(s, dir, "events")
        .select($"user_id", $"ts", $"event_id",
          (expr("unix_micros(ts)") -
            lag(expr("unix_micros(ts)"), 1).over(w)).as("d"))
        .filter($"d".isNotNull)
        .groupBy($"user_id")
        .agg(count($"d").cast(D).as("n"), sum($"d").cast(D).as("sd"),
          sum(($"d".cast(D)) * $"d").as("ssd"))
        .filter($"n" >= 9)
        .select($"user_id", $"n".cast("long").as("n_gaps"),
          expr("CAST((1000000 * (n * ssd - sd * sd)) div (sd * sd) " +
            "AS BIGINT)").as("cv2_ppm"))
        .withColumn("bot_like", $"cv2_ppm" < 100000L)
        .orderBy($"cv2_ppm", $"user_id").limit(20)
    },

    q("q313_percentile_ribbon",
      // Daily p10/p50/p90 ribbon of event values — the spread band every
      // latency/spend dashboard draws around its median line. Exact order
      // statistics per day over the COMPACTED (day, cents) domain:
      // cumulative counts + cross-multiplied threshold picks (10·cum >=
      // total / 2·cum >= total / 10·cum >= 9·total), so no float
      // percentile and no per-row rank over raw events. One compaction
      // shuffle; the windows run per day on value-domain-sized frames.
      """WITH g AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY day, cents),
        |c AS (SELECT day, cents, cnt,
        |    SUM(cnt) OVER (PARTITION BY day ORDER BY cents) AS cum,
        |    SUM(cnt) OVER (PARTITION BY day) AS total FROM g)
        |SELECT day, CAST(MIN(total) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN 10 * cum >= total THEN cents END) AS BIGINT)
        |    AS p10_c,
        |  CAST(MIN(CASE WHEN 2 * cum >= total THEN cents END) AS BIGINT)
        |    AS p50_c,
        |  CAST(MIN(CASE WHEN 10 * cum >= 9 * total THEN cents END)
        |    AS BIGINT) AS p90_c
        |FROM c GROUP BY day ORDER BY day""") { (s, dir) =>
      import s.implicits._
      val g = T(s, dir, "events")
        .groupBy(to_date($"ts").as("day"),
          floor($"value" * 100 + 0.5).cast("long").as("cents"))
        .agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy($"day").orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("cum", sum($"cnt").over(wc))
        .withColumn("total", sum($"cnt").over(wt))
        .groupBy($"day")
        .agg(min($"total").as("n"),
          min(when(lit(10) * $"cum" >= $"total", $"cents")).as("p10_c"),
          min(when(lit(2) * $"cum" >= $"total", $"cents")).as("p50_c"),
          min(when(lit(10) * $"cum" >= lit(9) * $"total", $"cents"))
            .as("p90_c"))
        .orderBy($"day")
    },
  )
}
