package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode / feature-extract
  * / resize / frame-sample stages.
  *
  * ALL THREE modalities decode for real: AUDIO (graft.audio.Pcm), IMAGE
  * (javax.imageio, pure JDK), and VIDEO (MJPEG-in-AVI — RIFF container
  * walk + per-frame JDK JPEG decode, graft.mm.Avi; retires the last
  * round-2 stub). The Spark-side plumbing is identical for all three:
  * schema, partition-preserving `mapPartitions` with an explicit batch
  * shape (the Scala analog of `mapInPandas`: rows are staged into
  * fixed-size batches, the kernel is called once per batch, results
  * flat-map back out), and frame sampling as a generator (posexplode),
  * which multiplies rows without shuffling. `decodeBatchStub` remains
  * only as the generic fake-payload harness for plumbing tests.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, mime: String,
                            media: Array[Byte], meta_w: Int, meta_h: Int,
                            n_frames: Int)

  final case class DecodedFeatures(media_id: Long, mime: String, width: Int,
                                   height: Int, n_frames: Int,
                                   mean_luma: Double, feature: Array[Float])

  /** Generic fake-payload kernel (plumbing-test harness only — every
    * real modality has its own kernel; video's is `videoFeatures` below):
    * interprets the first 12 bytes as (w:int32, h:int32, frames:int32)
    * little-endian and derives "pixels" from a hash of the payload. */
  def decodeBatchStub(batch: Seq[MediaRow]): Seq[DecodedFeatures] =
    batch.map { r =>
      val bb = java.nio.ByteBuffer.wrap(r.media).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (w, h, f) =
        if (r.media.length >= 12) (bb.getInt(0), bb.getInt(4), bb.getInt(8))
        else (0, 0, 0)
      var acc = 1125899906842597L
      r.media.foreach(b => acc = acc * 31 + b)
      val luma = ((acc & 0xffff).toDouble / 0xffff) * 255.0
      val feat = Array.tabulate(8)(i => (((acc >>> (i * 8)) & 0xff).toInt / 255.0f))
      DecodedFeatures(r.media_id, r.mime, w, h, f, luma, feat)
    }

  /** Batch-shaped decode stage (mapInPandas analog): partition-preserving,
    * no shuffle; `batchSize` bounds peak memory per task the way Arrow
    * batch size does for pandas UDFs. */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[DecodedFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatchStub(batch.toSeq))
    }
  }

  /** Frame sampling: every `everyN`-th frame index becomes a row
    * (media_id, frame_idx, byte_offset) — a generator (posexplode-style),
    * multiplies rows with zero shuffle; real frame extraction would join
    * these offsets back through the decode kernel. */
  def frameSample(df: DataFrame, everyN: Int): DataFrame = {
    df.select(col("media_id"), col("n_frames"), col("meta_w"), col("meta_h"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyN))))
      .withColumn("byte_offset",
        lit(12L) + col("frame_idx").cast("long") * col("meta_w") * col("meta_h"))
      .drop("n_frames")
  }

  /** Resize stage (stub kernel, real plumbing): pure-expression metadata
    * transform; the payload transform would live in the batch kernel. */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("meta_w"), col("meta_h"), lit(1)))
    df.withColumn("scale", round(scale, 6))
      .withColumn("out_w", floor(col("meta_w") * scale).cast("int"))
      .withColumn("out_h", floor(col("meta_h") * scale).cast("int"))
  }

  // ======== REAL MODALITY: audio ========
  // The audio codecs ARE implementable pure-JVM (graft.audio.Pcm:
  // pcm16/dpcm16/ulaw8), so the audio decode stage is REAL, not a stub —
  // same batch shape as the stubbed image/video path.

  final case class AudioRow(clip_id: String, bytes: Array[Byte],
                            codec: String, sr_hz: Int)

  final case class AudioFeatures(clip_id: String, n_samples: Int, dur_ms: Double,
                                 rms: Double, peak: Int, zero_cross_rate: Double)

  /** Real batched audio decode + feature extraction (duration, RMS energy,
    * peak amplitude, zero-crossing rate). Undecodable payloads are dropped
    * (the validation plan reports them; feature extraction is downstream
    * of validation in a pipeline). */
  def decodeAudioBatch(batch: Seq[AudioRow]): Seq[AudioFeatures] =
    batch.flatMap { r =>
      graft.audio.Pcm.decode(r.codec, r.bytes).flatMap { s =>
        if (s.isEmpty || r.sr_hz <= 0) None
        else {
          var sq = 0.0; var peak = 0; var zc = 0
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            sq += v.toDouble * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
            i += 1
          }
          Some(AudioFeatures(r.clip_id, s.length, s.length * 1000.0 / r.sr_hz,
            math.sqrt(sq / s.length),
            peak,
            if (s.length > 1) zc.toDouble / (s.length - 1) else 0.0))
        }
      }
    }

  /** Batch-shaped REAL audio feature stage — partition-preserving, no
    * shuffle, same contract as decodeFeatures. */
  def audioFeatures(ds: Dataset[AudioRow], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeAudioBatch(batch.toSeq))
    }
  }

  // ======== REAL MODALITY: image (javax.imageio — pure JDK) ========
  // PNG/JPEG/BMP/GIF decode ships in the JDK, so the image path is REAL:
  // decode, feature-extract (4x4 grid mean-luma) and resize (Graphics2D +
  // PNG re-encode) all run in the same batch shape as the other kernels.
  // Only the VIDEO kernel remains a stub (no container codec).

  final case class ImageRow(media_id: Long, media: Array[Byte])
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 mean_luma: Double, feature: Array[Float])

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }
  }

  /** Real batched image decode + features: dimensions, global mean luma
    * (Rec.601), and a 16-dim 4x4 grid-mean-luma feature vector (the
    * classic thumbnail embedding; deterministic). Undecodable payloads are
    * dropped — validation reports them upstream. */
  def decodeImageBatch(batch: Seq[ImageRow]): Seq[ImageFeatures] =
    batch.flatMap { r =>
      readImage(r.media).map { im =>
        val w = im.getWidth; val h = im.getHeight
        val grid = new Array[Double](16)
        val cnt = new Array[Long](16)
        var y = 0
        while (y < h) {
          val gy = math.min(3, y * 4 / math.max(1, h))
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            val g = gy * 4 + math.min(3, x * 4 / math.max(1, w))
            grid(g) += luma; cnt(g) += 1
            x += 1
          }
          y += 1
        }
        val feat = Array.tabulate(16)(i =>
          if (cnt(i) == 0) 0f else (grid(i) / cnt(i) / 255.0).toFloat)
        val mean = grid.sum / math.max(1L, cnt.sum)
        ImageFeatures(r.media_id, w, h, mean, feat)
      }
    }

  def imageFeatures(ds: Dataset[ImageRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(b => decodeImageBatch(b.toSeq)))
  }

  final case class ResizedImage(media_id: Long, out_w: Int, out_h: Int, media: Array[Byte])

  /** Real batched resize: longest side capped at `maxSide` (aspect kept),
    * bilinear, re-encoded as PNG. No-ops (already small) pass through
    * unchanged — re-encoding anyway would burn CPU for nothing at scale. */
  def resizeImageBatch(batch: Seq[ImageRow], maxSide: Int): Seq[ResizedImage] =
    batch.flatMap { r =>
      readImage(r.media).map { im =>
        val w = im.getWidth; val h = im.getHeight
        if (math.max(w, h) <= maxSide) ResizedImage(r.media_id, w, h, r.media)
        else {
          val s = maxSide.toDouble / math.max(w, h)
          val ow = math.max(1, math.floor(w * s).toInt)
          val oh = math.max(1, math.floor(h * s).toInt)
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(im, 0, 0, ow, oh, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedImage(r.media_id, ow, oh, bos.toByteArray)
        }
      }
    }

  def resizeImages(ds: Dataset[ImageRow], maxSide: Int,
                   batchSize: Int = 64): Dataset[ResizedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(b => resizeImageBatch(b.toSeq, maxSide)))
  }

  // ======== REAL MODALITY: video (MJPEG-in-AVI, graft.mm.Avi) ========

  final case class VideoRow(media_id: Long, media: Array[Byte])
  final case class VideoFeatures(media_id: Long, width: Int, height: Int,
                                 n_frames: Int, fps: Double, n_sampled: Int,
                                 mean_luma: Double, feature: Array[Float])

  /** Real batched video decode + features: the AVI container is walked
    * (header info + frame chunks), every `sampleEveryN`-th frame is JPEG-
    * decoded, and features aggregate across the sampled frames (global
    * mean luma + the 16-dim grid-luma embedding averaged over frames).
    * Frame sampling happens INSIDE the kernel — at 100 TB decoding every
    * frame of every clip is the cost center, and the container format
    * lets us skip whole chunks without touching the codec. Undecodable
    * payloads are dropped (validation reports them upstream). */
  def decodeVideoBatch(batch: Seq[VideoRow], sampleEveryN: Int = 1): Seq[VideoFeatures] =
    batch.flatMap { r =>
      Avi.parse(r.media).flatMap { case (info, frameChunks) =>
        val sampled = frameChunks.zipWithIndex
          .filter(_._2 % math.max(1, sampleEveryN) == 0)
          .flatMap(fc => readImage(fc._1))
        if (sampled.isEmpty) None
        else {
          val grid = new Array[Double](16)
          var lumaSum = 0.0; var px = 0L
          sampled.foreach { im =>
            val w = im.getWidth; val h = im.getHeight
            val cnt = new Array[Long](16)
            val g = new Array[Double](16)
            var y = 0
            while (y < h) {
              val gy = math.min(3, y * 4 / math.max(1, h))
              var x = 0
              while (x < w) {
                val rgb = im.getRGB(x, y)
                val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                  0.114 * (rgb & 0xff)
                val gi = gy * 4 + math.min(3, x * 4 / math.max(1, w))
                g(gi) += luma; cnt(gi) += 1
                lumaSum += luma
                x += 1
              }
              y += 1
            }
            px += w.toLong * h
            var i = 0
            while (i < 16) { if (cnt(i) > 0) grid(i) += g(i) / cnt(i); i += 1 }
          }
          val fps = if (info.usPerFrame > 0) 1e6 / info.usPerFrame else 0.0
          Some(VideoFeatures(r.media_id, info.width, info.height, info.nFrames,
            fps, sampled.length,
            lumaSum / math.max(1L, px),
            Array.tabulate(16)(i => (grid(i) / sampled.length / 255.0).toFloat)))
        }
      }
    }

  /** Batch-shaped REAL video feature stage — same mapPartitions contract
    * as the audio/image kernels. */
  def videoFeatures(ds: Dataset[VideoRow], sampleEveryN: Int = 1,
                    batchSize: Int = 16): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(b => decodeVideoBatch(b.toSeq, sampleEveryN)))
  }

  /** Deterministic synthetic MJPEG-AVI table (seeded gradient frames) —
    * real encoded videos for the video-kernel tests/bench. */
  def generateVideos(spark: SparkSession, n: Long, partitions: Int,
                     seed: Long = 42L): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val h = (seed ^ i) * 0x9E3779B97F4A7C15L
      val w = 16 + ((h >>> 8) % 32).toInt
      val ht = 16 + ((h >>> 16) % 32).toInt
      val nf = 3 + ((h >>> 24) % 8).toInt
      val frames = (0 until nf).map { f =>
        val im = new java.awt.image.BufferedImage(w, ht,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val base = (((h >>> 32) + f * 20) & 0xff).toInt
        var y = 0
        while (y < ht) {
          var x = 0
          while (x < w) {
            val v = (base + x * 200 / w) & 0xff
            im.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        im
      }
      VideoRow(i, Avi.encodeMjpegAvi(frames, fps = 10))
    }
  }

  /** Deterministic synthetic PNG table (seeded gradient tiles) — real
    * encoded images for the image-kernel tests/bench; no external data. */
  def generateImages(spark: SparkSession, n: Long, partitions: Int,
                     seed: Long = 42L): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val h = (seed ^ i) * 0x9E3779B97F4A7C15L
      val w = 24 + ((h >>> 8) % 40).toInt
      val ht = 24 + ((h >>> 16) % 40).toInt
      val base = ((h >>> 24) & 0xff).toInt
      val im = new java.awt.image.BufferedImage(w, ht,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < ht) {
        var x = 0
        while (x < w) {
          val v = (base + x * 255 / w) & 0xff
          im.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.setUseCache(false)
      javax.imageio.ImageIO.write(im, "png", bos)
      ImageRow(i, bos.toByteArray)
    }
  }

  /** Deterministic fake media table (seeded) for tests/bench. */
  def generate(spark: SparkSession, n: Long, partitions: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val h = (seed ^ i) * 0x9E3779B97F4A7C15L
      val w = 16 + ((h >>> 8) % 64).toInt
      val ht = 16 + ((h >>> 16) % 64).toInt
      val frames = 1 + ((h >>> 24) % 30).toInt
      val payload = new Array[Byte](12 + 16)
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0, w); bb.putInt(4, ht); bb.putInt(8, frames)
      var j = 12
      var acc = h
      while (j < payload.length) { acc = acc * 6364136223846793005L + 1442695040888963407L; payload(j) = (acc >>> 56).toByte; j += 1 }
      MediaRow(i, if (i % 3 == 0) "video/fake" else "image/fake", payload, w, ht, frames)
    }
  }
}
