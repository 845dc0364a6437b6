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

  test("REAL audio modality: batched decode + features match a direct computation") {
    import spark.implicits._
    import graft.mm.Multimodal.AudioRow
    val clips = graft.audio.ClipsGen.generate(spark, 200, partitions = 4, corruptionRate = 0.0)
    val rows = clips.map(c => AudioRow(c.clip_id, c.bytes, c.codec, c.sr_hz))
    val feats = Multimodal.audioFeatures(rows, batchSize = 16)
    // no shuffle — partition-preserving batch stage
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = feats.collect().map(f => f.clip_id -> f).toMap
    assert(got.size == 200)
    // spot-check one clip against a direct single-row computation
    val one = clips.head()
    val direct = Multimodal.decodeAudioBatch(
      Seq(AudioRow(one.clip_id, one.bytes, one.codec, one.sr_hz))).head
    val viaSpark = got(one.clip_id)
    assert(viaSpark.n_samples == direct.n_samples)
    assert(math.abs(viaSpark.rms - direct.rms) < 1e-9)
    assert(viaSpark.peak == direct.peak && viaSpark.peak > 0)
    assert(viaSpark.zero_cross_rate > 0.0 && viaSpark.zero_cross_rate < 1.0)
    // duration consistent with the stored metadata
    val meta = clips.filter(_.clip_id == one.clip_id).head()
    assert(math.abs(viaSpark.dur_ms - meta.dur_ms) < 1.0)
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
