package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Microbench (round-11 optimization session): q199's 15 moment sums with
  * terms cast to DECIMAL(28,6) (BigDecimal-backed) vs DECIMAL(18,6)
  * (compact-Long-backed) — the values are identical whenever every term has
  * < 13 integer digits (both casts round to 6 decimals the same way; the
  * sum buffer is exact either way), but precision ≤ 18 keeps Spark's
  * Decimal on the primitive-Long fast path end to end.
  */
object ProfileDsum {
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
    val b = graft.Tables.load(spark, sfDir, "lineitem").select(
      $"l_quantity".cast("double").as("x1"),
      ($"l_extendedprice" / 100000).as("x2"),
      $"l_discount".as("x3"), $"l_tax".as("x4"))
    b.cache(); t("cache lineitem proj")(b.count())
    def moments(dec: DecimalType) = {
      def ds(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast(DoubleType)
      b.agg(count(lit(1)).cast("double").as("n"),
        ds($"x1").as("s1"), ds($"x2").as("s2"),
        ds($"x3").as("s3"), ds($"x4").as("s4"),
        ds($"x1" * $"x1").as("s11"), ds($"x2" * $"x2").as("s22"),
        ds($"x3" * $"x3").as("s33"), ds($"x4" * $"x4").as("s44"),
        ds($"x1" * $"x2").as("s12"), ds($"x1" * $"x3").as("s13"),
        ds($"x1" * $"x4").as("s14"), ds($"x2" * $"x3").as("s23"),
        ds($"x2" * $"x4").as("s24"), ds($"x3" * $"x4").as("s34"))
        .collect()(0)
    }
    (1 to 3).foreach { i =>
      val r28 = t(s"run $i: DECIMAL(28,6) 15 sums")(moments(DecimalType(28, 6)))
      val r18 = t(s"run $i: DECIMAL(18,6) 15 sums")(moments(DecimalType(18, 6)))
      val same = (0 until 15).forall(j => r28.getDouble(j) == r18.getDouble(j))
      println(s"[probe] run $i bit-identical: $same")
    }
    // the real suspect: the single-row-group fixture scan serializes the
    // whole cast+agg pipeline into ONE task — spread it first
    val bs = graft.Tables.load(spark, sfDir, "lineitem")
      .repartition(32)
      .select(
        $"l_quantity".cast("double").as("x1"),
        ($"l_extendedprice" / 100000).as("x2"),
        $"l_discount".as("x3"), $"l_tax".as("x4"))
    def momentsOf(df: org.apache.spark.sql.DataFrame) = {
      def ds(c: org.apache.spark.sql.Column) =
        sum(c.cast(DecimalType(28, 6))).cast(DoubleType)
      df.agg(count(lit(1)).cast("double").as("n"),
        ds($"x1").as("s1"), ds($"x2").as("s2"),
        ds($"x3").as("s3"), ds($"x4").as("s4"),
        ds($"x1" * $"x1").as("s11"), ds($"x2" * $"x2").as("s22"),
        ds($"x3" * $"x3").as("s33"), ds($"x4" * $"x4").as("s44"),
        ds($"x1" * $"x2").as("s12"), ds($"x1" * $"x3").as("s13"),
        ds($"x1" * $"x4").as("s14"), ds($"x2" * $"x3").as("s23"),
        ds($"x2" * $"x4").as("s24"), ds($"x3" * $"x4").as("s34"))
        .collect()(0)
    }
    (1 to 3).foreach { i =>
      val rs = t(s"run $i: spread(32) DECIMAL(28,6) 15 sums")(momentsOf(bs))
      val r28 = momentsOf(b)
      val same = (0 until 15).forall(j => rs.getDouble(j) == r28.getDouble(j))
      println(s"[probe] spread run $i identical to serial: $same")
    }
    spark.stop()
  }
}
