package graft.audio

import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.compile.{CompileOptions, CustomKeyword}
import graft.run.{Validation, ValidationPlan}
import graft.spec.{JsonValue, JNum}
import graft.audio.expressions._

/** The full constraint suite for the north-rule clips table: the scalar
  * JSON-Schema keywords compiled from a spec, plus the audio-specific
  * checks (codec decodability, byte-length consistency, decoded-PCM SNR,
  * transcript equality) expressed through the CUSTOM-KEYWORD REGISTRY —
  * the analog of `with_keyword` + custom content encodings
  * (`options.rs:185-290,438`, `keywords/custom.rs`). The audio keywords
  * appear in the spec document itself (root-level `x-audio-*`), so the
  * whole suite is one declarative spec + one options object. */
object AudioChecks {

  val MinSnrDb = 30.0

  /** Full clip spec: scalar column keywords + the x-audio-* custom
    * keywords (registered below). SURVEY §7 minimum slice, lifted onto the
    * extension surface. */
  val clipSpecJson: String = s"""{
    "properties": {
      "clip_id":    {"type": "string", "pattern": "^clip-[0-9a-f]{16}$$"},
      "sr_hz":      {"type": "integer", "enum": [8000, 16000, 22050, 24000, 44100, 48000]},
      "dur_ms":     {"type": "integer", "minimum": 1, "maximum": 600000},
      "codec":      {"type": "string", "enum": ["pcm16", "dpcm16", "ulaw8"]},
      "transcript": {"type": "string", "maxLength": 10000}
    },
    "required": ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
    "x-audio-bytesConsistent": true,
    "x-audio-snr": $MinSnrDb,
    "x-audio-transcript": true
  }"""

  /** Expected payload length given (codec, sr_hz, dur_ms): codec-dispatched
    * bytes/sample × samples. Pure Column arithmetic. */
  private def expectedBytes(row: Column): Column = {
    // Spark `/` is fractional even on integers — truncate like the codec
    val samples = floor((row.getField("sr_hz").cast(LongType) * row.getField("dur_ms")) / 1000L)
      .cast(LongType)
    when(row.getField("codec").isin("pcm16", "dpcm16"), samples * 2L)
      .when(row.getField("codec") === "ulaw8", samples)
      .otherwise(lit(null))
  }

  private def guards(row: Column): Column =
    row.getField("bytes").isNotNull && row.getField("codec").isNotNull &&
      row.getField("sr_hz").isNotNull && row.getField("dur_ms").isNotNull

  private def hasFields(dt: DataType, names: String*): Boolean = dt match {
    case st: StructType => names.forall(st.fieldNames.contains)
    case _ => false
  }

  /** The audio keyword registry — each entry compiles against the ROOT
    * struct target (the whole row), so predicates can correlate columns.
    * Catalyst's SimplifyExtractValueOps collapses the getFields back to
    * plain column references — zero runtime cost. */
  def audioKeywords: Map[String, CustomKeyword] = Map(
    // byte-length consistency: cheap arithmetic BEFORE the decode check
    "x-audio-bytesConsistent" -> CustomKeyword(
      compile = (_, row, dt) =>
        if (!hasFields(dt, "bytes", "codec", "sr_hz", "dur_ms")) None
        else Some(coalesce(
          when(guards(row), length(row.getField("bytes")) === expectedBytes(row)),
          lit(true))),
      messageCol = Some((_, row, _) =>
        concat(lit("payload of "), length(row.getField("bytes")).cast(StringType),
          lit(" bytes is inconsistent with sr_hz*dur_ms under codec "),
          row.getField("codec")))),
    // decodability + decoded-PCM SNR >= <value> dB vs reference synthesis
    "x-audio-snr" -> CustomKeyword(
      compile = (v, row, dt) =>
        if (!hasFields(dt, "clip_id", "bytes", "codec", "sr_hz", "dur_ms")) None
        else {
          val minDb = v match { case n: JNum => n.value.toDouble; case _ => MinSnrDb }
          val snr = snrOf(row)
          // r06 plan fix: `!isnan(snr) && snr >= minDb` put TWO textual
          // copies of the AudioSnr expression in the hot predicate, and
          // codegen subexpression elimination does not extract
          // subexpressions inside conditional branches — every row passing
          // the guards paid the decode+synthesis kernel twice (verified in
          // the generated code). nanvl gives the identical truth table
          // (NaN → -Inf → false; null propagates) with ONE call site.
          Some(coalesce(
            when(guards(row) && length(row.getField("bytes")) === expectedBytes(row),
              nanvl(snr, lit(Double.NegativeInfinity)) >= minDb),
            lit(true)))
        },
      messageCol = Some((v, row, _) => {
        val minDb = v match { case n: JNum => n.value.toDouble; case _ => MinSnrDb }
        val snr = snrOf(row)
        concat(lit("decoded PCM SNR "),
          when(isnan(snr), lit("NaN")).otherwise(round(snr, 1).cast(StringType)),
          lit(s" dB is below the $minDb dB gate for codec "), row.getField("codec"))
      })),
    // transcript string equality vs deterministic reference transcript
    "x-audio-transcript" -> CustomKeyword(
      compile = (_, row, dt) =>
        if (!hasFields(dt, "clip_id", "transcript")) None
        else Some(
          coalesce(row.getField("transcript") === expected_transcript(row.getField("clip_id")),
            lit(false)) || row.getField("clip_id").isNull),
      messageCol = Some((_, _, _) =>
        lit("transcript does not match the reference transcript"))),
  )

  private def snrOf(row: Column): Column =
    audio_snr(row.getField("clip_id"), row.getField("bytes"), row.getField("codec"),
      row.getField("sr_hz"), row.getField("dur_ms"))

  def compileOptions: CompileOptions = CompileOptions(customKeywords = audioKeywords)

  /** Full plan: one spec + the audio keyword registry. */
  def fullPlan(schema: StructType, minSnrDb: Double = MinSnrDb): ValidationPlan = {
    val spec =
      if (minSnrDb == MinSnrDb) clipSpecJson
      else clipSpecJson.replace(s""""x-audio-snr": $MinSnrDb""", s""""x-audio-snr": $minSnrDb""")
    Validation.compile(spec, schema, compileOptions)
  }
}
