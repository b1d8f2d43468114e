package graft.operators

import graft.ColFns.davgSql
import graft.QueryDef.q
import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}

/** The user-extension surface (SURVEY.md §2B "UDF surface") mirroring the
  * reference's handler hook (the only computation surface it has —
  * /root/reference/lib/redix/stream/consumer.ex:283-299): a scalar Scala UDF,
  * a typed `Aggregator` UDAF, and a `Dataset.flatMap` generator (UDTF-style).
  * Each is intentionally SQL-replicable so the oracle can check the plumbing;
  * real engine code should prefer built-ins / native expressions (see
  * GraftExpressions) — a Scala UDF is an opaque box to Catalyst.
  */
object UdfSurface {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Decimal-exact mean — Aggregator form of ColFns.davg: per-value quantize
    * to 6dp (same as CAST(x AS DECIMAL(28,6))), exact decimal sum, one final
    * IEEE division. Order-independent, so parallel merge order can't flap
    * the result.
    */
  private object DecimalAvg extends Aggregator[Double, (BigDecimal, Long), Double] {
    override def zero: (BigDecimal, Long) = (BigDecimal(0).setScale(6), 0L)
    override def reduce(b: (BigDecimal, Long), a: Double): (BigDecimal, Long) =
      (b._1 + BigDecimal(a).setScale(6, BigDecimal.RoundingMode.HALF_UP), b._2 + 1)
    override def merge(x: (BigDecimal, Long), y: (BigDecimal, Long)): (BigDecimal, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (BigDecimal, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / r._2
    override def bufferEncoder: Encoder[(BigDecimal, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(BigDecimal, Long)]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val defs: Seq[QueryDef] = Seq(

    q("q62_udf_scalar",
      """SELECT o_orderkey,
        |  CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_rank
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      import s.implicits._
      val prioRank = udf((p: String) => p.substring(0, 1).toLong)
      T(s, dir, "orders")
        .select($"o_orderkey", prioRank($"o_orderpriority").as("prio_rank"))
        .orderBy($"o_orderkey")
    },

    q("q63_udaf_aggregator",
      s"""SELECT l_returnflag, ${davgSql("l_quantity")} AS avg_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      import s.implicits._
      val avgQty = udaf(DecimalAvg)
      T(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(avgQty($"l_quantity").as("avg_qty"))
        .orderBy($"l_returnflag")
    },

    q("q64_flatmap_words",
      """SELECT w AS word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |) WHERE w IN ('the', 'spark', 'join')
        |GROUP BY w ORDER BY word""") { (s, dir) =>
      import s.implicits._
      // UDTF-style generator: one input row → many output rows via typed
      // flatMap (the reference's handler could only consume; this emits).
      val target = Set("the", "spark", "join")
      T(s, dir, "documents")
        .select($"text").as[String]
        .flatMap(_.split(' '))
        .filter(w => target.contains(w))
        .toDF("word")
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"word")
    },
  )
}
