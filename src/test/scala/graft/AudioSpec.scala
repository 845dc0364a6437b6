package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.audio._
import graft.table.TableChecks

class AudioSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("codec round-trips: pcm16/dpcm16 lossless, ulaw8 >= 30dB SNR") {
    for (sr <- Seq(8000, 48000); dur <- Seq(20, 150)) {
      val s = Pcm.synthesize(s"clip-ab$sr$dur", sr, dur)
      assert(Pcm.decodePcm16(Pcm.encodePcm16(s)).sameElements(s))
      assert(Pcm.decodeDpcm16(Pcm.encodeDpcm16(s)).sameElements(s))
      val snrU = Pcm.snrDb(s, Pcm.decodeUlaw8(Pcm.encodeUlaw8(s)))
      assert(snrU >= 30.0, s"ulaw8 snr $snrU at sr=$sr dur=$dur")
    }
  }

  test("snrDb: exact match caps at 120, corrupted is low, length mismatch NaN") {
    val s = Pcm.synthesize("clip-x", 16000, 100)
    assert(Pcm.snrDb(s, s) == 120.0)
    val noisy = s.map(v => (v + 5000).toShort)
    assert(Pcm.snrDb(s, noisy) < 15.0)
    assert(Pcm.snrDb(s, s.take(10)).isNaN)
  }

  test("generator: clean rows pass the full plan; corruption classes are caught") {
    val clips = ClipsGen.generate(spark, 2000, partitions = 4,
      corruptionRate = 0.05, hotKeyEvery = 200)
    val df = clips.toDF()
    val plan = AudioChecks.fullPlan(df.schema)
    val out = plan.withValidation(df).cache()
    try {
      val invalid = out.where(!col("valid")).count()
      val total = out.count()
      // ~5% corruption over 2000 rows (hot rows are never corrupted)
      assert(invalid > 40 && invalid < 200, s"invalid=$invalid of $total")
      // every violation keyword we expect shows up across the corpus
      val kws = out.select(explode(col("violations")).as("v"))
        .select(col("v.keyword")).distinct().collect().map(_.getString(0)).toSet
      assert(Set("pattern", "enum", "minimum", "x-audio-bytesConsistent",
        "x-audio-snr", "x-audio-transcript").subsetOf(kws), kws.toString)
      // clean rows: zero violations
      val cleanInvalid = out.where(col("valid") && size(col("violations")) > 0).count()
      assert(cleanInvalid == 0)
    } finally out.unpersist()
  }

  test("hot duplicate key is caught by salted uniqueness check") {
    val clips = ClipsGen.generate(spark, 1000, partitions = 4,
      corruptionRate = 0.0, hotKeyEvery = 100)
    val dups = TableChecks.uniquenessViolations(clips.toDF(), Seq("clip_id")).collect()
    assert(dups.length == 1)
    assert(dups(0).getString(0) == ClipsGen.HotClipId)
    assert(dups(0).getAs[Long]("cnt") == 10)
  }

  test("audio_snr expression stays inside whole-stage codegen") {
    val clips = ClipsGen.generate(spark, 10, partitions = 1, corruptionRate = 0.0)
    val df = clips.toDF().select(
      expressions.audio_snr(col("clip_id"), col("bytes"), col("codec"),
        col("sr_hz"), col("dur_ms")).as("snr"))
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("*(1) Project [audiosnr"), physical)
    val snrs = df.collect().map(_.getDouble(0))
    assert(snrs.forall(_ >= 30.0))
  }

  test("expected_transcript expression matches generator") {
    val clips = ClipsGen.generate(spark, 50, partitions = 1, corruptionRate = 0.0)
    val bad = clips.toDF()
      .where(!(col("transcript") === expressions.expected_transcript(col("clip_id"))))
      .count()
    assert(bad == 0)
  }
}
