package graft.operators

import graft.ColFns._
import graft.QueryDef.q
import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar function library (SURVEY.md §2B "scalar fns"): string, date/time,
  * math, array, map, JSON and conditional expressions. All are codegen'd
  * Catalyst built-ins (`org.apache.spark.sql.functions`) — no UDFs — so they
  * stay inside WholeStageCodegen at any scale.
  */
object Scalars {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    q("q28_string_fns",
      """SELECT p_partkey,
        |  UPPER(p_brand) AS brand_u,
        |  LOWER(p_type) AS type_l,
        |  SUBSTR(p_name, 1, 10) AS name10,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  CONCAT(p_brand, '#', p_type) AS brand_type,
        |  REPLACE(p_type, 'ECONOMY', 'ECO') AS type_r,
        |  REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word,
        |  TRIM(CONCAT('  ', p_name, '  ')) AS trimmed
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "part").select(
        $"p_partkey",
        upper($"p_brand").as("brand_u"),
        lower($"p_type").as("type_l"),
        substring($"p_name", 1, 10).as("name10"),
        length($"p_name").cast("long").as("name_len"),
        concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
        expr("replace(p_type, 'ECONOMY', 'ECO')").as("type_r"),
        regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
        trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed")
      ).orderBy($"p_partkey")
    },

    q("q29_date_fns",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) + 1 AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      import s.implicits._
      // DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday — oracle adds 1.
      T(s, dir, "orders").select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        dayofweek($"o_orderdate").cast("long").as("dow"),
        date_trunc("MONTH", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate", lit("1995-01-01")).cast("long").as("days_since"),
        date_add($"o_orderdate", 30).as("plus30")
      ).orderBy($"o_orderkey")
    },

    q("q30_math_fns",
      s"""SELECT l_orderkey, l_linenumber,
        |  ABS(l_discount - 0.05) AS abs_d,
        |  CAST(FLOOR(l_extendedprice * l_tax * 100 + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS tax_amt,
        |  SQRT(l_extendedprice) AS sq,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS cl,
        |  l_orderkey % 7 AS mod7,
        |  CAST(${graft.ColFns.detMlnSql(
             "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)", "100")}
        |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS ln6,
        |  l_quantity * l_quantity AS qty_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "lineitem").select(
        $"l_orderkey", $"l_linenumber",
        abs($"l_discount" - 0.05).as("abs_d"),
        // NOT round(): Spark rounds the exact binary value (BigDecimal
        // HALF_UP) while DuckDB multiplies-then-rounds — they disagree near
        // .xx5. floor(x*100 + 0.5)/100 is bit-identical on both engines.
        (floor($"l_extendedprice" * $"l_tax" * 100 + 0.5).cast("double") / 100.0).as("tax_amt"),
        sqrt($"l_extendedprice").as("sq"),
        floor($"l_extendedprice").as("fl"),
        ceil($"l_extendedprice").as("cl"),
        ($"l_orderkey" % 7).as("mod7"),
        // ln over the EXACT cents rational via the deterministic software
        // ln — no libm in a hashed column
        (graft.ColFns.detMln(floor($"l_extendedprice" * 100 + 0.5), lit(100L))
          .cast("double") / 1000000.0).as("ln6"),
        ($"l_quantity" * $"l_quantity").as("qty_sq")
      ).orderBy($"l_orderkey", $"l_linenumber")
    },

    q("q31_array_fns",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  string_split(text, ' ')[1] AS first_word,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      val words = split($"text", " ")
      T(s, dir, "documents").select(
        $"doc_id",
        size(words).cast("long").as("n_words"),
        element_at(words, 1).as("first_word"),
        array_contains(words, "spark").as("has_spark"),
        size(array_distinct(words)).cast("long").as("n_distinct")
      ).orderBy($"doc_id")
    },

    q("q32_map_fns",
      // Map results are relationally expressible, so the oracle states the
      // expected values directly rather than re-building the map.
      """SELECT doc_id, lang AS lang_v, source AS source_v,
        |  'lang,source' AS keys_csv, CAST(2 AS BIGINT) AS n_keys
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      val m = map(lit("lang"), $"lang", lit("source"), $"source")
      T(s, dir, "documents").select(
        $"doc_id",
        element_at(m, "lang").as("lang_v"),
        element_at(m, "source").as("source_v"),
        concat_ws(",", map_keys(m)).as("keys_csv"),
        size(map_keys(m)).cast("long").as("n_keys")
      ).orderBy($"doc_id")
    },

    q("q33_json_fns",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(props->>'$.k' AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "events").select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        expr("from_json(props, 'k BIGINT').k").as("k_num")
      ).orderBy($"event_id")
    },

    q("q34_case_expr",
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
         |            WHEN o_totalprice < 300000 THEN 'mid'
         |            ELSE 'high' END AS bucket,
         |  COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS rev
         |FROM orders GROUP BY 1 ORDER BY bucket""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "orders")
        .withColumn("bucket",
          when($"o_totalprice" < 100000, "low")
            .when($"o_totalprice" < 300000, "mid")
            .otherwise("high"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("rev"))
        .orderBy($"bucket")
    },

    q("q468_json_schema_census", {
      s"""WITH j AS (SELECT event_id, event_type,
         |    $jsonDocExprDuck AS doc FROM events),
         |x AS (SELECT event_type,
         |    CAST(json_extract_string(doc, '$$.k') AS BIGINT) AS k,
         |    CAST(json_array_length(json_extract(doc, '$$.tags'))
         |      AS BIGINT) AS n_tags,
         |    json_extract_string(doc, '$$.geo.lat') AS lat_s
         |  FROM j)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(k) AS BIGINT) AS sum_k,
         |  CAST(SUM(n_tags) AS BIGINT) AS sum_tags,
         |  CAST(SUM(CASE WHEN lat_s IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_geo,
         |  CAST((SUM(CASE WHEN lat_s IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000) // COUNT(*) AS BIGINT) AS geo_ppm,
         |  CAST(SUM(COALESCE(CAST(lat_s AS BIGINT), 0)) AS BIGINT)
         |    AS sum_lat
         |FROM x GROUP BY event_type ORDER BY event_type"""
    }) { (s, dir) =>
      import s.implicits._
      // Semi-structured (nested JSON) ingest census — q33 extracts the
      // flat fixture key; real event payloads carry nested objects,
      // variable-length arrays, and OPTIONAL fields, and the pipeline's
      // first question is "what shape is this feed, per type": presence
      // rates and aggregates per path. The document is synthesized by
      // re-wrapping the fixture's own props key (so the inner value
      // rides through TWO real JSON parses) with a tags array whose
      // length varies and a geo object present only on every fourth
      // event; both engines then parse with their native JSON functions
      // (get_json_object / json_extract) — a cross-engine check of JSON
      // path semantics, not just string math. Map-side parse + one
      // type-keyed rollup; 100 TB-trivial.
      T(s, dir, "events")
        .withColumn("doc", expr(jsonDocExprSpark))
        .select($"event_type",
          expr("CAST(get_json_object(doc, '$.k') AS BIGINT)").as("k"),
          expr("CAST(json_array_length(get_json_object(doc, '$.tags')) " +
            "AS BIGINT)").as("n_tags"),
          get_json_object($"doc", "$.geo.lat").as("lat_s"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          sum($"n_tags").as("sum_tags"),
          sum(when($"lat_s".isNotNull, 1L).otherwise(0L)).as("n_geo"),
          expr("CAST((SUM(CASE WHEN lat_s IS NOT NULL THEN 1 ELSE 0 END) " +
            "* 1000000) div COUNT(*) AS BIGINT)").as("geo_ppm"),
          sum(coalesce(expr("CAST(lat_s AS BIGINT)"), lit(0L))).as("sum_lat"))
        .orderBy($"event_type")
    },
  )

  // ---- q468 fixture synthesis: a nested JSON document re-wrapping the
  // fixture's own flat props (the inner '$.k' value is itself obtained by
  // a real JSON parse), with a variable-length tags array and an optional
  // geo object. Rendered per dialect only because the inner extraction
  // function differs; the produced STRING is byte-identical.

  private def jsonDocExpr(kExtract: String): String =
    "concat('{\"k\": ', " + kExtract + ", ', \"tags\": [\"t', " +
      "CAST(event_id % 3 AS STRING), '\"" +
      ", \"t', CAST(event_id % 5 AS STRING), '\"', " +
      "CASE WHEN event_id % 3 = 0 THEN concat(', \"t', " +
      "CAST(event_id % 7 AS STRING), '\"') ELSE '' END, " +
      "'], ', " +
      "CASE WHEN event_id % 4 = 0 THEN concat('\"geo\": {\"lat\": ', " +
      "CAST(event_id % 90 AS STRING), ', \"lon\": ', " +
      "CAST(event_id % 180 AS STRING), '}, ') ELSE '' END, " +
      "'\"v\": ', CAST(event_id % 1000 AS STRING), '}')"

  private def jsonDocExprSpark: String =
    jsonDocExpr("get_json_object(props, '$.k')")

  private def jsonDocExprDuck: String =
    jsonDocExpr("json_extract_string(props, '$.k')")
}
