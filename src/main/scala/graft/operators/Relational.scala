package graft.operators

import graft.ColFns._
import graft.QueryDef.{q, qNoOracle}
import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational operator inventory (SURVEY.md §2B): projection/filter,
  * equi/non-equi/outer/semi/anti/cross joins, hash aggregation,
  * rollup/cube/grouping sets, window functions, sort/limit/top-k, set ops.
  *
  * The reference (hayesgm/redix_stream) delegates all computation to
  * user handler callbacks (/root/reference/README.md:35); these make the
  * delegated analytics first-class on Spark. All plans are declarative
  * DataFrame/SQL so Catalyst applies pushdown, pruning and join selection;
  * small dimension tables are broadcast explicitly.
  */
object Relational {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // --- scan / projection / filter / aggregation -------------------------

    q("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1999-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          dsum(($"l_extendedprice" * (lit(1.0) - $"l_discount")) * (lit(1.0) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity BETWEEN 30 AND 40
        |  AND l_returnflag IN ('A', 'R')
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem")
        .filter($"l_quantity".between(30, 40) &&
          $"l_returnflag".isin("A", "R") && $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // --- joins ------------------------------------------------------------

    q("q03_join_broadcast_agg",
      s"""SELECT c_mktsegment,
         |  COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""") { (s, dir) =>
      import s.implicits._
      // customer is the small dimension side — broadcast it so the 100 TB
      // fact side never shuffles for this join.
      T(s, dir, "orders")
        .join(broadcast(T(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
        .orderBy($"c_mktsegment")
    },

    q("q04_join_left_agg",
      s"""SELECT c_custkey,
         |  COUNT(o.o_orderkey) AS n_big,
         |  COALESCE(${dsumSql("o.o_totalprice")}, 0.0) AS big_spend
         |FROM customer
         |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
         |  ON c_custkey = o.o_custkey
         |GROUP BY c_custkey
         |ORDER BY c_custkey""") { (s, dir) =>
      import s.implicits._
      val big = T(s, dir, "orders").filter($"o_totalprice" > 300000)
      T(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_big"),
          coalesce(dsum($"o_totalprice"), lit(0.0)).as("big_spend"))
        .orderBy($"c_custkey")
    },

    q("q05_join_right_agg",
      s"""SELECT p_partkey, p_name,
         |  COUNT(l_orderkey) AS n_li,
         |  COALESCE(${dsumSql("l_quantity")}, 0.0) AS qty
         |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
         |GROUP BY p_partkey, p_name
         |ORDER BY p_partkey""") { (s, dir) =>
      import s.implicits._
      // Aggregate-below-outer-join rewrite: reduce the fact side to one row
      // per key first, then broadcast-join the dimension — the 100 TB plan
      // (no wide-row outer join, no big-side shuffle for the join itself).
      val liAgg = T(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(count($"l_orderkey").as("n_li0"), dsum($"l_quantity").as("qty0"))
      T(s, dir, "part")
        .join(broadcast(liAgg), $"p_partkey" === $"l_partkey", "left")
        .select($"p_partkey", $"p_name",
          coalesce($"n_li0", lit(0L)).as("n_li"),
          coalesce($"qty0", lit(0.0)).as("qty"))
        .orderBy($"p_partkey")
    },

    q("q06_join_full",
      """SELECT COALESCE(a.o_custkey, b.c_custkey) AS custkey,
        |  COALESCE(a.n_big, 0) AS n_big,
        |  b.c_acctbal AS acctbal
        |FROM (SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |      WHERE o_totalprice > 450000 GROUP BY o_custkey) a
        |FULL JOIN (SELECT c_custkey, c_acctbal FROM customer
        |           WHERE c_acctbal < -900) b
        |  ON a.o_custkey = b.c_custkey
        |ORDER BY custkey""") { (s, dir) =>
      import s.implicits._
      val a = T(s, dir, "orders").filter($"o_totalprice" > 450000)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_big"))
      val b = T(s, dir, "customer").filter($"c_acctbal" < -900)
        .select($"c_custkey", $"c_acctbal")
      a.join(b, $"o_custkey" === $"c_custkey", "full")
        .select(coalesce($"o_custkey", $"c_custkey").as("custkey"),
          coalesce($"n_big", lit(0L)).as("n_big"),
          $"c_acctbal".as("acctbal"))
        .orderBy($"custkey")
    },

    q("q07_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""") { (s, dir) =>
      import s.implicits._
      val big = T(s, dir, "orders").filter($"o_totalprice" > 450000)
      T(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    q("q08_join_anti",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""") { (s, dir) =>
      import s.implicits._
      val big = T(s, dir, "orders").filter($"o_totalprice" > 450000)
      T(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_acctbal")
        .orderBy($"c_custkey")
    },

    q("q09_join_cross",
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
        |ORDER BY r_name, o_orderpriority""") { (s, dir) =>
      import s.implicits._
      val prios = T(s, dir, "orders").select($"o_orderpriority").distinct()
      T(s, dir, "region").crossJoin(prios)
        .select($"r_name", $"o_orderpriority")
        .orderBy($"r_name", $"o_orderpriority")
    },

    q("q10_join_range",
      """SELECT p1.p_size AS size, COUNT(*) AS n_pairs
        |FROM part p1 JOIN part p2
        |  ON p2.p_size BETWEEN p1.p_size - 1 AND p1.p_size + 1
        | AND p1.p_partkey < p2.p_partkey
        | AND p1.p_brand <> p2.p_brand
        |GROUP BY p1.p_size
        |ORDER BY p1.p_size""") { (s, dir) =>
      import s.implicits._
      // Band (range) join made shuffle-friendly: explode the ±1 neighborhood
      // of the left key so the range condition becomes an equi-join on size —
      // this is the 100 TB-safe plan (no O(n^2) nested-loop cross join).
      val p1 = T(s, dir, "part")
        .select($"p_partkey".as("a_key"), $"p_size".as("a_size"), $"p_brand".as("a_brand"))
        .withColumn("nsize", explode(array($"a_size" - 1, $"a_size", $"a_size" + 1)))
      val p2 = T(s, dir, "part")
        .select($"p_partkey".as("b_key"), $"p_size".as("b_size"), $"p_brand".as("b_brand"))
      p1.join(p2, $"nsize" === $"b_size" && $"a_key" < $"b_key" && $"a_brand" =!= $"b_brand")
        .groupBy($"a_size")
        .agg(count(lit(1)).as("n_pairs"))
        .select($"a_size".as("size"), $"n_pairs")
        .orderBy($"size")
    },

    // --- aggregation variants --------------------------------------------

    q("q11_agg_stats",
      s"""SELECT l_returnflag, n, min_qty, max_qty, avg_price,
         |  ROUND(SQRT((sx2 * n - sx * sx) / (n * (n - 1))), 4) AS std_price
         |FROM (
         |  SELECT l_returnflag,
         |    COUNT(*) AS n,
         |    MIN(l_quantity) AS min_qty,
         |    MAX(l_quantity) AS max_qty,
         |    ${davgSql("l_extendedprice")} AS avg_price,
         |    ${dsumSql("l_extendedprice")} AS sx,
         |    ${dsumSql("l_extendedprice * l_extendedprice")} AS sx2
         |  FROM lineitem GROUP BY l_returnflag
         |) ORDER BY l_returnflag""") { (s, dir) =>
      import s.implicits._
      // stddev via exact decimal sums (order-independent), rather than the
      // order-dependent streaming variance the builtin computes.
      T(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"),
          davg($"l_extendedprice").as("avg_price"),
          dsum($"l_extendedprice").as("sx"),
          dsum($"l_extendedprice" * $"l_extendedprice").as("sx2"))
        .select($"l_returnflag", $"n", $"min_qty", $"max_qty", $"avg_price",
          // DECIMAL→DOUBLE conversion of sx2 (~1e13 at scale 6) exceeds
          // 2^53 of significand, where Spark and DuckDB round differently
          // by 1 ulp — round the derived stat to absorb it.
          round(sqrt(($"sx2" * $"n" - $"sx" * $"sx") / ($"n" * ($"n" - lit(1L)))), 4).as("std_price"))
        .orderBy($"l_returnflag")
    },

    q("q12_count_distinct",
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },

    // HLL sketch values are engine-specific, so the oracle checks the
    // sketch's accuracy CONTRACT instead: the (deterministic) estimate must
    // sit within 5% of the exact distinct count, which the oracle states as
    // a constant-true column next to the exact count it can verify.
    q("q13_approx_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_exact,
        |  true AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_exact"),
          approx_count_distinct($"l_partkey", 0.02).as("approx"))
        .select($"l_returnflag", $"n_exact",
          (abs($"approx" - $"n_exact") / $"n_exact" < 0.05).as("within_5pct"))
        .orderBy($"l_returnflag")
    },

    q("q14_rollup",
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |  ${dsumSql("c_acctbal")} AS bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "customer")
        .join(broadcast(T(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(T(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("bal"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    },

    q("q15_cube",
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS rev
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("rev"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    q("q16_grouping_sets",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${dsumSql("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (s, dir) =>
      // Same ANSI text runs on both engines — share it verbatim.
      Tables.registerAll(s, dir)
      s.sql(
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |  ${dsumSql("l_quantity")} AS qty
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    q("q17_collect_strings",
      """SELECT l_returnflag,
        |  STRING_AGG(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(concat_ws(",", sort_array(collect_set($"l_linestatus"))).as("statuses"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // --- window functions -------------------------------------------------

    q("q18_window_topk",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders
        |) WHERE rn <= 3
        |ORDER BY o_custkey, rn""") { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },

    q("q19_window_lag",
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      T(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    q("q20_window_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""") { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "lineitem")
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          sum($"l_quantity".cast(Dec)).over(w).cast("double").as("run_qty"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    },

    q("q21_window_ntile",
      """SELECT c_custkey,
        |  CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bucket
        |FROM customer
        |ORDER BY c_custkey""") { (s, dir) =>
      import s.implicits._
      // Global ntile is inherently a single ordered pass; fine for a
      // quartile assignment, not a 100 TB hot path.
      val w = Window.orderBy($"c_acctbal", $"c_custkey")
      T(s, dir, "customer")
        .select($"c_custkey", ntile(4).over(w).cast("long").as("bucket"))
        .orderBy($"c_custkey")
    },

    q("q22_window_range",
      """SELECT c_custkey,
        |  CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
        |    RANGE BETWEEN CAST(100.0 AS DOUBLE) PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
        |FROM customer
        |ORDER BY c_custkey""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey,
          |  CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
          |    RANGE BETWEEN CAST(100.0 AS DOUBLE) PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
          |FROM customer
          |ORDER BY c_custkey""".stripMargin)
    },

    // --- sort / limit / top-k --------------------------------------------

    q("q23_top20",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""") { (s, dir) =>
      import s.implicits._
      // orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
      // then a tiny driver-side merge — no global sort at any scale.
      T(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    },

    // --- set operations ---------------------------------------------------

    q("q24_union",
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 400000
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9900
        |ORDER BY custkey""") { (s, dir) =>
      import s.implicits._
      val a = T(s, dir, "orders")
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 400000)
        .select($"o_custkey".as("custkey"))
      val b = T(s, dir, "customer")
        .filter($"c_acctbal" > 9900)
        .select($"c_custkey".as("custkey"))
      a.unionByName(b).distinct().orderBy($"custkey")
    },

    q("q25_intersect",
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  AND o_totalprice > 400000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |  AND o_totalprice > 400000
        |ORDER BY custkey""") { (s, dir) =>
      import s.implicits._
      val urgent = T(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000)
        .select($"o_custkey".as("custkey"))
      val low = T(s, dir, "orders")
        .filter($"o_orderpriority" === "5-LOW" && $"o_totalprice" > 400000)
        .select($"o_custkey".as("custkey"))
      urgent.intersect(low).orderBy($"custkey")
    },

    q("q26_except",
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  AND o_totalprice > 400000
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |  AND o_totalprice > 400000
        |ORDER BY custkey""") { (s, dir) =>
      import s.implicits._
      val urgent = T(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000)
        .select($"o_custkey".as("custkey"))
      val low = T(s, dir, "orders")
        .filter($"o_orderpriority" === "5-LOW" && $"o_totalprice" > 400000)
        .select($"o_custkey".as("custkey"))
      urgent.except(low).orderBy($"custkey")
    },

    q("q27_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus")
        .distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    q("q318_sla_attainment",
      // Operational SLA attainment: order-to-ship latency per order
      // priority — share of line items shipped within 30/60/90 days plus
      // the exact P90 latency, the fulfillment dashboard row. Latencies
      // are integer day diffs; attainment is a ppm count; P90 is a
      // cross-multiplied order statistic over the COMPACTED per-priority
      // latency domain (bounded by the latency range, never fact-sized).
      // One fact join with the orders side on the join key, one
      // compaction, windows on the bounded domain.
      """WITH f AS (SELECT o.o_orderpriority AS pri,
        |    CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
        |      AS lat
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |g AS (SELECT pri, lat, CAST(COUNT(*) AS BIGINT) AS cnt FROM f
        |  GROUP BY pri, lat),
        |c AS (SELECT pri, lat, cnt,
        |    SUM(cnt) OVER (PARTITION BY pri ORDER BY lat) AS cum,
        |    SUM(cnt) OVER (PARTITION BY pri) AS total FROM g)
        |SELECT pri, CAST(MIN(total) AS BIGINT) AS n_lines,
        |  CAST((1000000 * SUM(CASE WHEN lat <= 30 THEN cnt ELSE 0 END))
        |    // MIN(total) AS BIGINT) AS within_30d_ppm,
        |  CAST((1000000 * SUM(CASE WHEN lat <= 60 THEN cnt ELSE 0 END))
        |    // MIN(total) AS BIGINT) AS within_60d_ppm,
        |  CAST(MIN(CASE WHEN 10 * cum >= 9 * total THEN lat END) AS BIGINT)
        |    AS p90_days
        |FROM c GROUP BY pri ORDER BY pri""") { (s, dir) =>
      import s.implicits._
      val g = T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), $"o_orderkey" === $"l_orderkey")
        .select($"o_orderpriority".as("pri"),
          datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
            .cast("long").as("lat"))
        .groupBy($"pri", $"lat").agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy($"pri").orderBy($"lat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy($"pri")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("cum", sum($"cnt").over(wc))
        .withColumn("total", sum($"cnt").over(wt))
        .groupBy($"pri")
        .agg(min($"total").as("n_lines"),
          expr("(1000000 * SUM(CASE WHEN lat <= 30 THEN cnt ELSE 0 END)) " +
            "div MIN(total)").as("within_30d_ppm"),
          expr("(1000000 * SUM(CASE WHEN lat <= 60 THEN cnt ELSE 0 END)) " +
            "div MIN(total)").as("within_60d_ppm"),
          min(when(lit(10) * $"cum" >= lit(9) * $"total", $"lat"))
            .as("p90_days"))
        .orderBy($"pri")
    },

    q("q319_mode_agg",
      // MODE — the most frequent value per group with a fully
      // deterministic (count DESC, value) tie-break, plus its support
      // share in ppm: the categorical summary statistic the engine's
      // min/max/avg family lacked. Two keyed aggregations and one window
      // on the compacted (group, value) table; no fact-sized ranking.
      """WITH g AS (SELECT l_returnflag AS flag,
        |    CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY flag, qty),
        |r AS (SELECT flag, qty, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cnt DESC, qty)
        |      AS rn,
        |    SUM(cnt) OVER (PARTITION BY flag) AS total FROM g)
        |SELECT flag, qty AS mode_qty, cnt AS mode_count,
        |  CAST((1000000 * cnt) // total AS BIGINT) AS support_ppm
        |FROM r WHERE rn = 1 ORDER BY flag""") { (s, dir) =>
      import s.implicits._
      val g = T(s, dir, "lineitem")
        .groupBy($"l_returnflag".as("flag"),
          floor($"l_quantity" + 0.5).cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"flag")
      g.withColumn("rn",
          row_number().over(w.orderBy($"cnt".desc, $"qty")))
        .withColumn("total", sum($"cnt").over(w))
        .filter($"rn" === 1)
        .select($"flag", $"qty".as("mode_qty"), $"cnt".as("mode_count"),
          expr("(1000000 * cnt) div total").as("support_ppm"))
        .orderBy($"flag")
    },

    q("q334_rollup_revenue",
      // ROLLUP(region, nation) — the hierarchical subtotal operator
      // itself (not a hand-built union of grouping levels): per-nation
      // revenue, per-region subtotals, and the grand total in ONE
      // aggregation pass, exactly how a reporting layer asks for it.
      // Spark expands the grouping sets BEFORE the shuffle so all three
      // levels partial-aggregate map-side. Levels are disambiguated by
      // the per-column GROUPING flags (portable across engines, unlike
      // the packed grouping_id whose bit order is dialect-defined);
      // labels COALESCE to 'ALL'. Revenue is exact integer cents.
      """SELECT COALESCE(r.r_name, 'ALL') AS region,
        |  CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END
        |    AS nation,
        |  CAST(GROUPING(r.r_name) AS BIGINT) AS region_rolled,
        |  CAST(GROUPING(n.n_name) AS BIGINT) AS nation_rolled,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS revenue_cents
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)
        |ORDER BY region, nation""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), $"c_custkey" === $"o_custkey")
        .join(broadcast(T(s, dir, "nation")),
          $"n_nationkey" === $"c_nationkey")
        .join(broadcast(T(s, dir, "region")),
          $"r_regionkey" === $"n_regionkey")
        .select($"r_name", $"n_name",
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
        .rollup($"r_name", $"n_name")
        .agg(grouping($"r_name").cast("long").as("region_rolled"),
          grouping($"n_name").cast("long").as("nation_rolled"),
          count(lit(1)).as("n_orders"), sum($"cents").as("revenue_cents"))
        .select(coalesce($"r_name", lit("ALL")).as("region"),
          when($"nation_rolled" === 1, "ALL").otherwise($"n_name")
            .as("nation"),
          $"region_rolled", $"nation_rolled", $"n_orders", $"revenue_cents")
        .orderBy($"region", $"nation")
    },

    q("q335_cube_quantity",
      // CUBE(returnflag, linestatus) — every marginal of the 2-D
      // contingency in one pass: per-cell, per-flag, per-status, and
      // grand-total quantity sums, the cross-tab a BI layer renders with
      // both margins. Same portable GROUPING-flag discipline as q334;
      // exact integer units.
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS flag_rolled,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS status_rolled,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
        |    AS total_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus",
          floor($"l_quantity" + 0.5).cast("long").as("q"))
        .cube($"l_returnflag", $"l_linestatus")
        .agg(grouping($"l_returnflag").cast("long").as("flag_rolled"),
          grouping($"l_linestatus").cast("long").as("status_rolled"),
          count(lit(1)).as("n_lines"), sum($"q").as("total_qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("flag"),
          coalesce($"l_linestatus", lit("ALL")).as("status"),
          $"flag_rolled", $"status_rolled", $"n_lines", $"total_qty")
        .orderBy($"flag", $"status")
    },
  )
}
