package graft.audio

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.ColumnBridge

/** Static entry points callable from generated code (top-level object ⇒
  * static forwarders on class AudioFns). */
object AudioFns {
  /** SNR (dB) of the payload decoded under `codec` against the reference
    * synthesis for (clipId, srHz, durMs). NaN ⇒ undecodable / unknown
    * codec / length mismatch. The per-row analog of the north rule's
    * "decoded-PCM allclose (SNR≥30dB)" invariant. */
  def audioSnr(clipId: UTF8String, bytes: Array[Byte], codec: UTF8String,
               srHz: Int, durMs: Int): Double = {
    if (srHz <= 0 || durMs <= 0) return Double.NaN
    Pcm.decode(codec.toString, bytes) match {
      case None => Double.NaN
      case Some(decoded) =>
        val ref = Pcm.synthesize(clipId.toString, srHz, durMs)
        Pcm.snrDb(ref, decoded)
    }
  }

  def expectedTranscript(clipId: UTF8String): UTF8String =
    UTF8String.fromString(Pcm.expectedTranscript(clipId.toString))
}

/** snr_db(clip_id, bytes, codec, sr_hz, dur_ms) — codegen-capable custom
  * Expression; the decode loop is the dominant per-row cost, so it must
  * not break whole-stage codegen (SURVEY §4.2: no UDFs on the hot path). */
case class AudioSnr(first: Expression, second: Expression, third: Expression,
                    fourth: Expression, fifth: Expression) extends QuinaryExpression {
  override def children: Seq[Expression] = Seq(first, second, third, fourth, fifth)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any, e: Any): Any =
    AudioFns.audioSnr(a.asInstanceOf[UTF8String], b.asInstanceOf[Array[Byte]],
      c.asInstanceOf[UTF8String], d.asInstanceOf[Int], e.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d, e) =>
      s"graft.audio.AudioFns.audioSnr($a, $b, $c, $d, $e)")

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AudioSnr =
    AudioSnr(newChildren(0), newChildren(1), newChildren(2), newChildren(3), newChildren(4))
}

/** expected_transcript(clip_id) — deterministic reference transcript. */
case class ExpectedTranscript(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    AudioFns.expectedTranscript(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.audio.AudioFns.expectedTranscript($c)")
  override protected def withNewChildInternal(newChild: Expression): ExpectedTranscript =
    copy(child = newChild)
}

object expressions {
  def audio_snr(clipId: Column, bytes: Column, codec: Column,
                srHz: Column, durMs: Column): Column =
    ColumnBridge.toCol(AudioSnr(ColumnBridge.toExpr(clipId), ColumnBridge.toExpr(bytes),
      ColumnBridge.toExpr(codec), ColumnBridge.toExpr(srHz), ColumnBridge.toExpr(durMs)))

  def expected_transcript(clipId: Column): Column =
    ColumnBridge.toCol(ExpectedTranscript(ColumnBridge.toExpr(clipId)))
}
