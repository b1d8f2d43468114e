package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the streaming-executed query path (not part of the
  * driver contract; used to attribute time between produce and drain).
  */
object ProfileQ78 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warmup
    graft.Tables.load(spark, sfDir, "events").count()

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val root = java.nio.file.Files.createTempDirectory("prof-q78").toString
    t("write 100k to graftlog") {
      graft.Tables.load(spark, sfDir, "events")
        .selectExpr("CAST(event_id AS STRING) AS event_id",
          "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s", "event_type")
        .write.format("graftlog")
        .option("path", root).option("stream", "ev")
        .mode("append").save()
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def drain(label: String, limit: Option[Int], shuffleParts: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffleParts)
      t(s"drain [$label]") {
        val src = spark.readStream.format("graftlog")
          .option("path", root).option("stream", "ev")
          .option("startingOffsets", "earliest")
        val withLim = limit.fold(src)(l => src.option("maxEntriesPerTrigger", l.toString))
        val q = withLim.load()
          .select(to_timestamp($"values.ts_s").as("ets"), $"values.event_type".as("event_type"))
          .groupBy(window($"ets", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(s"prof_sink_$label")
          .option("checkpointLocation", java.nio.file.Files.createTempDirectory("prof-ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    drain("b4p8", Some(30000), "8")
    drain("b1p8", None, "8")
    drain("b4p2", Some(30000), "2")
    drain("b10p8", Some(10000), "8")
    spark.stop()
  }
}
