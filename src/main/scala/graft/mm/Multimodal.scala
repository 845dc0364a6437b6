package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The container has no media codecs, so the DECODE KERNEL IS A STUB
  * (`???`-equivalent: a deterministic fake header parse, clearly marked
  * below) — the Spark-side plumbing is real: schema, partition-preserving
  * `mapPartitions` with an explicit batch shape (the Scala analog of
  * `mapInPandas`: rows are staged into fixed-size batches, the kernel is
  * called once per batch, results flat-map back out), and frame sampling
  * as a generator (posexplode), which multiplies rows without shuffling.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, mime: String,
                            media: Array[Byte], meta_w: Int, meta_h: Int,
                            n_frames: Int)

  final case class DecodedFeatures(media_id: Long, mime: String, width: Int,
                                   height: Int, n_frames: Int,
                                   mean_luma: Double, feature: Array[Float])

  /** ======== STUB ========
    * Deterministic fake decode: interprets the first 12 bytes as
    * (w:int32, h:int32, frames:int32) little-endian and derives "pixels"
    * from a hash of the payload. A real deployment swaps in an actual
    * codec here — signature and batch shape stay identical. */
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
