package graft.audio

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.compile.{Check, CompileOptions, SpecCompiler}
import graft.run.{Validation, ValidationPlan}
import graft.audio.expressions._

/** The full constraint suite for the north-rule clips table: the scalar
  * JSON-Schema keywords compiled from a spec, plus the audio-specific
  * checks (codec decodability, byte-length consistency, decoded-PCM SNR,
  * transcript equality) — the analog of custom content encodings / custom
  * keywords (`options.rs:185-290`, `keywords/custom.rs`). */
object AudioChecks {

  val MinSnrDb = 30.0

  /** Scalar column spec (SURVEY §7 minimum slice). */
  val clipSpecJson: String = """{
    "properties": {
      "clip_id":    {"type": "string", "pattern": "^clip-[0-9a-f]{16}$"},
      "sr_hz":      {"type": "integer", "enum": [8000, 16000, 22050, 24000, 44100, 48000]},
      "dur_ms":     {"type": "integer", "minimum": 1, "maximum": 600000},
      "codec":      {"type": "string", "enum": ["pcm16", "dpcm16", "ulaw8"]},
      "transcript": {"type": "string", "maxLength": 10000}
    },
    "required": ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
  }"""

  /** Expected payload length given (codec, sr_hz, dur_ms): codec-dispatched
    * bytes/sample × samples. Pure Column arithmetic. */
  def expectedBytes = {
    // Spark `/` is fractional even on integers — truncate like the codec
    val samples = floor((col("sr_hz").cast(LongType) * col("dur_ms")) / 1000L).cast(LongType)
    when(col("codec").isin("pcm16", "dpcm16"), samples * 2L)
      .when(col("codec") === "ulaw8", samples)
      .otherwise(lit(null))
  }

  /** The audio-specific checks as engine [[Check]]s (same violation
    * machinery / error paths as keyword checks). */
  def audioChecks(minSnrDb: Double = MinSnrDb): Vector[Check] = {
    val snr = audio_snr(col("clip_id"), col("bytes"), col("codec"),
      col("sr_hz"), col("dur_ms"))
    val guards = col("bytes").isNotNull && col("codec").isNotNull &&
      col("sr_hz").isNotNull && col("dur_ms").isNotNull
    Vector(
      // byte-length consistency: cheap arithmetic BEFORE the decode check
      // (priority < contentEncoding, like format length pre-filters)
      Check("consistentWith", "/audio/bytes/consistentWith", "/bytes", 32,
        coalesce(when(guards, length(col("bytes")) === expectedBytes), lit(true)),
        concat(lit("payload of "), length(col("bytes")).cast(StringType),
          lit(" bytes is inconsistent with sr_hz*dur_ms under codec "), col("codec"))),
      // decodability + decoded-PCM SNR >= 30 dB vs reference synthesis
      Check("contentEncoding", "/audio/bytes/contentEncoding", "/bytes", 33,
        coalesce(
          when(guards && length(col("bytes")) === expectedBytes,
            !isnan(snr) && snr >= minSnrDb),
          lit(true)),
        concat(lit("decoded PCM SNR "),
          when(isnan(snr), lit("NaN")).otherwise(round(snr, 1).cast(StringType)),
          lit(s" dB is below the $minSnrDb dB gate for codec "), col("codec"))),
      // transcript string equality vs deterministic reference transcript
      Check("transcriptEquality", "/audio/transcript/equality", "/transcript", 34,
        coalesce(col("transcript") === expected_transcript(col("clip_id")), lit(false))
          || col("clip_id").isNull,
        lit("transcript does not match the reference transcript")),
    )
  }

  /** Full plan: compiled scalar spec + audio checks, priority-ordered. */
  def fullPlan(schema: StructType, minSnrDb: Double = MinSnrDb): ValidationPlan = {
    val scalar = Validation.compile(clipSpecJson, schema)
    ValidationPlan((scalar.checks ++ audioChecks(minSnrDb)).sortBy(_.priority))
  }
}
