package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off stage probe for q261's wall-clock (round-7 session): times the
  * pair-gen, edge-rank, and wedge stages separately to locate the cost.
  */
object ProfileQ261 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("o"), $"l_suppkey".as("p")).distinct()
    val wts = li.as("a")
      .join(li.as("b"), $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .groupBy($"a.p".as("s1"), $"b.p".as("s2"))
      .agg(count(lit(1)).as("c"))
    t("warmup count(lineitem)")(graft.Tables.load(spark, sfDir, "lineitem").count())
    t("pair-gen wts")(wts.count())
    val rkW = Window.orderBy($"c".desc, $"s1", $"s2")
    val e0 = wts
      .withColumn("rn", row_number().over(rkW))
      .withColumn("nw", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter($"rn" * 10 <= $"nw" * 3)
      .select($"s1", $"s2")
      .cache()
    t("e0 rank+cache")(e0.count())
    val adj = e0.select($"s1".as("u"), $"s2".as("v"))
      .unionAll(e0.select($"s2".as("u"), $"s1".as("v"))).cache()
    t("adj cache")(adj.count())
    val deg = adj.groupBy($"u".as("s")).agg(count(lit(1)).as("d"))
    val cand = adj.as("a")
      .join(adj.as("b"), $"a.v" === $"b.v" && $"a.u" < $"b.u")
      .groupBy($"a.u".as("x"), $"b.u".as("y"))
      .agg(count(lit(1)).as("cn"))
    t("wedge cand")(cand.count())
    val ne = cand.join(e0, $"x" === $"s1" && $"y" === $"s2", "left_anti")
    val out = ne
      .join(broadcast(deg.select($"s".as("x"), $"d".as("deg_a"))), Seq("x"))
      .join(broadcast(deg.select($"s".as("y"), $"d".as("deg_b"))), Seq("y"))
      .select($"x", $"y", $"cn", $"deg_a", $"deg_b",
        expr("(cn * 1000000) div (deg_a + deg_b - cn)").as("j"))
      .orderBy($"j".desc, $"x", $"y").limit(20)
    t("final top-20")(out.count())
    t("final again (all warm)")(out.count())
    spark.stop()
  }
}
