package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off stage probe for q229's wall-clock (round-11 optimization
  * session): times the e0 edge build and each peel round's degree/semi-join
  * pieces separately to locate the cost.
  */
object ProfileQ229 {
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
    t("warmup")(graft.Tables.load(spark, sfDir, "lineitem").count())
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey").distinct()
    val e0 = li.as("a")
      .join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_suppkey" < $"b.l_suppkey")
      .groupBy($"a.l_suppkey".as("s1"), $"b.l_suppkey".as("s2"))
      .agg(count(lit(1)).as("w"))
      .filter($"w" >= 4)
      .select($"s1", $"s2")
      .cache()
    t("e0 build+cache")(e0.count())
    def peel(e: DataFrame, r: Int): (DataFrame, DataFrame) = {
      val deg = e.select($"s1".as("s")).unionAll(e.select($"s2".as("s")))
        .groupBy($"s").agg(count(lit(1)).as("d"))
      val v = t(s"round $r: deg+v cache")(
        { val x = deg.filter($"d" >= 3).select($"s").cache(); x.count(); x })
      val e2 = e
        .join(broadcast(v.withColumnRenamed("s", "s1")), Seq("s1"), "left_semi")
        .join(broadcast(v.withColumnRenamed("s", "s2")), Seq("s2"), "left_semi")
        .select($"s1", $"s2")
        .cache()
      t(s"round $r: e2 semi-join cache+count")(e2.count())
      (v, e2)
    }
    val (v1, e1) = peel(e0, 1)
    val (v2, e2) = peel(e1, 2)
    val (v3, e3) = peel(e2, 3)
    val traj = t("trajectory counts (6 actions)")(
      Seq((v1, e1), (v2, e2), (v3, e3)).zipWithIndex
        .map { case ((v, e), i) => (i + 1L, v.count(), e.count()) })
    println(traj)
    // second pass, warm
    Seq(e0, v1, e1, v2, e2, v3, e3).foreach(_.unpersist(false))
    val t0 = System.nanoTime()
    val fn = graft.SparkEntry.queries("q229_kcore_decomposition")
    fn(spark, sfDir).count()
    println(f"[probe] full q229 via SparkEntry: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.CacheScope.release()
    spark.stop()
  }
}
