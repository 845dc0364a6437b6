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

  test("image kernel: real PNG decode, grid-luma features, no shuffle") {
    import java.awt.image.BufferedImage
    def png(im: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos); bos.toByteArray
    }
    // constant gray 128 → mean luma exactly 128
    val gray = new BufferedImage(32, 20, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 32) gray.setRGB(x, y, 0x808080)
    // left half black, right half white → grid columns 0,1 ≈ 0; 2,3 ≈ 1
    val split = new BufferedImage(40, 40, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 40; x <- 0 until 40) split.setRGB(x, y, if (x < 20) 0 else 0xffffff)
    val rows = Seq(
      Multimodal.ImageRow(1L, png(gray)),
      Multimodal.ImageRow(2L, png(split)),
      Multimodal.ImageRow(3L, Array[Byte](1, 2, 3, 4))) // undecodable → dropped
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[Multimodal.ImageRow])
    val feats = Multimodal.imageFeatures(ds, batchSize = 2)
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = feats.collect().map(f => f.media_id -> f).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L).width == 32 && got(1L).height == 20)
    assert(math.abs(got(1L).mean_luma - 128.0) < 0.5)
    val f2 = got(2L).feature
    assert(f2.length == 16)
    for (r <- 0 until 4) {
      assert(f2(r * 4) < 0.05 && f2(r * 4 + 1) < 0.05, f2.mkString(","))
      assert(f2(r * 4 + 2) > 0.9 && f2(r * 4 + 3) > 0.9, f2.mkString(","))
    }
  }

  test("image resize: real bilinear downscale + PNG re-encode, small passthrough") {
    val src = Multimodal.generateImages(spark, 20, partitions = 2)
    val out = Multimodal.resizeImages(src, maxSide = 32, batchSize = 8).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(math.max(r.out_w, r.out_h) <= 32)
      // the payload re-decodes to exactly the declared dimensions
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
      assert(im.getWidth == r.out_w && im.getHeight == r.out_h)
    }
    // a small image passes through byte-identical (no wasteful re-encode)
    val row = Multimodal.generateImages(spark, 1, 1).collect().head
    val small = Multimodal.resizeImageBatch(Seq(row), maxSide = 1000).head
    assert(small.media sameElements row.media)
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

  test("REAL video modality: MJPEG-AVI round-trips through the container codec") {
    import graft.mm.Avi
    val frames = (0 until 5).map { f =>
      val im = new java.awt.image.BufferedImage(20, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 20) {
        val v = (40 * f + x * 5) & 0xff
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    val avi = Avi.encodeMjpegAvi(frames, fps = 10)
    // the container declares itself as RIFF/AVI
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val Some((info, chunks)) = Avi.parse(avi): @unchecked
    assert(info.width == 20 && info.height == 12 && info.nFrames == 5)
    assert(info.usPerFrame == 100000)
    assert(chunks.length == 5)
    // every frame chunk is a complete JPEG that the JDK decodes at size
    chunks.foreach { j =>
      assert((j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8) // SOI marker
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
      assert(im.getWidth == 20 && im.getHeight == 12)
    }
    // garbage and truncation are rejected, not crashed on
    assert(Avi.parse("notavideo".getBytes).isEmpty)
    assert(Avi.parse(avi.take(40)).exists(_._2.isEmpty) || Avi.parse(avi.take(40)).isEmpty)
  }

  test("REAL video modality: batched decode, frame sampling, luma fidelity, no shuffle") {
    import graft.mm.Multimodal.VideoRow
    val vids = Multimodal.generateVideos(spark, 40, partitions = 4)
    val feats = Multimodal.videoFeatures(vids, sampleEveryN = 1, batchSize = 8)
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = feats.collect().map(f => f.media_id -> f).toMap
    assert(got.size == 40)
    val src = vids.collect().map(v => v.media_id -> v).toMap
    got.values.foreach { f =>
      val Some((info, chunks)) = graft.mm.Avi.parse(src(f.media_id).media): @unchecked
      assert(f.width == info.width && f.height == info.height)
      assert(f.n_frames == info.nFrames && f.n_sampled == chunks.length)
      assert(f.fps == 10.0)
      assert(f.feature.length == 16)
      // JPEG is lossy but the gradient's mean luma survives within a few
      // levels: recompute from the decoded frames directly
      val direct = chunks.flatMap(c =>
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(c))))
      val lumas = for { im <- direct; y <- 0 until im.getHeight; x <- 0 until im.getWidth }
        yield {
          val rgb = im.getRGB(x, y)
          0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        }
      assert(math.abs(f.mean_luma - lumas.sum / lumas.size) < 1e-9)
    }
    // sampling every 2nd frame halves the decoded count, metadata intact
    val sampled = Multimodal.videoFeatures(vids, sampleEveryN = 2, batchSize = 8)
      .collect().map(f => f.media_id -> f).toMap
    sampled.values.foreach { f =>
      assert(f.n_sampled == (got(f.media_id).n_frames + 1) / 2)
      assert(f.n_frames == got(f.media_id).n_frames)
    }
    // a corrupted payload is dropped, not crashed on
    import spark.implicits._
    val corrupted = Seq(VideoRow(999L, Array.fill[Byte](64)(7))).toDS()
    assert(Multimodal.videoFeatures(corrupted).collect().isEmpty)
  }
}
