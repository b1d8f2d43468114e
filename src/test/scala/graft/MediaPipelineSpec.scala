package graft

import graft.multimodal.{MediaPipeline, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batched feature extraction over binary payloads") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "text").as[(Long, String)]
    val media = MediaPipeline.fromText(spark, docs, "image/png")
    val feats = MediaPipeline.extractFeatures(spark, media).collect()
    assert(feats.length == 500)
    val f = feats.minBy(_.media_id)
    assert(f.n_bytes > 0)
    assert(f.byte_mean > 0 && f.byte_mean < 256)
    assert(f.byte_var >= 0)
    assert(f.width >= 16 && f.height == (f.width * 3) / 4)
    assert(f.frames == 1) // images decode to a single frame
  }

  test("video mime yields frame counts; extraction is deterministic") {
    import spark.implicits._
    val rows = spark.createDataset(Seq((1L, "abc"), (2L, "defgh")))
    val media = MediaPipeline.fromText(spark, rows, "video/mp4")
    val a = MediaPipeline.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val b = MediaPipeline.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.frames >= 1))
  }

  test("resize plan fits within the box preserving aspect; identity inside") {
    assert(MediaPipeline.resizePlan(100, 50, 200, 200) == ((100, 50)))
    val (w, h) = MediaPipeline.resizePlan(1000, 500, 200, 200)
    assert(w == 200 && h == 100) // aspect 2:1 preserved
    val (w2, h2) = MediaPipeline.resizePlan(500, 1000, 200, 100)
    assert(h2 == 100 && w2 == 50)
    assert(MediaPipeline.resizePlan(10000, 1, 5, 5)._1 >= 1) // never zero
  }

  test("batched resize emits same-schema records with the plan recorded") {
    import spark.implicits._
    val rows = spark.createDataset(Seq((1L, "a" * 5000), (2L, "bb")))
    val media = MediaPipeline.fromText(spark, rows, "image/png")
    val resized = MediaPipeline.resize(spark, media, 64, 64).collect().sortBy(_.media_id)
    assert(resized.length == 2)
    assert(resized.forall(_.mime.startsWith("image/png;w=")))
    val dims = resized.map(_.mime.split(";").drop(1).map(_.split("=")(1).toInt))
    assert(dims.forall { case Array(w, h) => w <= 64 && h <= 64 && w >= 1 && h >= 1 })
    // chaining replaces the plan instead of accumulating conflicting params
    val twice = MediaPipeline.resize(
      spark, MediaPipeline.resize(spark, media, 64, 64), 32, 32).collect()
    assert(twice.forall(_.mime.count(_ == ';') == 2))
  }

  test("frame sampling picks every k-th frame bounded by maxFrames") {
    assert(MediaPipeline.sampleFrames(3, 10) == Seq(0, 1, 2))
    val s = MediaPipeline.sampleFrames(100, 10)
    assert(s.size == 10 && s.head == 0 && s.last <= 99 && s == s.sorted)
  }
}
