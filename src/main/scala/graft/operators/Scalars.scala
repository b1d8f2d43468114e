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
  )
}
