package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.mm.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("batch-shaped decode stage: schema + values, partition-preserving") {
    val media = Multimodal.generate(spark, 200, partitions = 4)
    val decoded = Multimodal.decodeFeatures(media, batchSize = 16)
    assert(decoded.schema.fieldNames.toSet ==
      Set("media_id", "mime", "width", "height", "n_frames", "mean_luma", "feature"))
    val rows = decoded.collect()
    assert(rows.length == 200)
    // stub decode recovers the metadata planted in the fake header
    val byId = media.collect().map(m => m.media_id -> m).toMap
    rows.foreach { r =>
      assert(r.width == byId(r.media_id).meta_w)
      assert(r.n_frames == byId(r.media_id).n_frames)
      assert(r.feature.length == 8)
    }
    // no shuffle in the physical plan (mapPartitions is partition-local)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("frame sampling explodes without shuffle") {
    val media = Multimodal.generate(spark, 50, partitions = 2).toDF()
    val frames = Multimodal.frameSample(media, everyN = 5)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val got = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = media.select("media_id", "n_frames").collect()
      .map(r => r.getLong(0) -> ((math.max(r.getInt(1) - 1, 0) / 5) + 1).toLong).toMap
    assert(got == expect)
  }

  test("resize metadata clamps the long side") {
    val media = Multimodal.generate(spark, 50, partitions = 2).toDF()
    val resized = Multimodal.resizeMeta(media, maxSide = 32)
    val bad = resized.where(col("out_w") > 32 || col("out_h") > 32).count()
    assert(bad == 0)
    // upscaling never happens
    val up = resized.where(col("out_w") > col("meta_w")).count()
    assert(up == 0)
  }
}
