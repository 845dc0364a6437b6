package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers referenced from generated code. Top-level object ⇒
  * static forwarders exist on class `graft.functions.GraftFns`, so
  * whole-stage codegen can call them directly. */
object GraftFns {
  private val regexCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, java.lang.Boolean]) =
          size() > 4096
      })

  /** Is `s` a compilable regex? (format: "regex" —
    * `/root/reference/crates/jsonschema/src/keywords/format.rs` regex arm.)
    * Compiled-pattern cache per executor, the analog of the reference's
    * regex compile cache (`compiler.rs:147,634-705`). */
  def regexValid(s: UTF8String): Boolean = {
    val str = s.toString
    val cached = regexCache.get(str)
    if (cached != null) cached.booleanValue()
    else {
      val ok =
        try { java.util.regex.Pattern.compile(graft.spec.EcmaRegex.translate(str)); true }
        catch { case _: Exception => false }
      regexCache.put(str, java.lang.Boolean.valueOf(ok))
      ok
    }
  }

  /** Exact `multipleOf` for fractional divisors, matching the reference's
    * BigFraction-of-f64 semantics (`jsonschema-value/src/numeric.rs:126-151`).
    * The fraction crate converts an f64 via its SHORTEST DECIMAL
    * representation (0.0075 → 75/10000, not the dyadic expansion) — the
    * official suite's "0.0075 is multiple of 0.0001 = true" depends on it —
    * so we use BigDecimal.valueOf (= Double.toString) for both operands.
    * Unlike a DecimalType(38,15) cast this neither overflows at
    * |x| >= 1e23 (silent false-accept) nor rounds >15 fractional digits. */
  def isMultipleOf(value: Double, multiple: Double): Boolean = {
    if (value == 0d) true // zero is a multiple of any non-zero number
    else if (!java.lang.Double.isFinite(value)) false
    else if (math.abs(value) < math.abs(multiple)) false
    else
      java.math.BigDecimal.valueOf(value)
        .remainder(java.math.BigDecimal.valueOf(multiple))
        .signum == 0
  }

  private def asciiHostnameOk(h: String): Boolean = {
    val host = if (h.endsWith(".")) h.dropRight(1) else h
    if (host.isEmpty || host.length > 253) return false
    host.split("\\.", -1).forall { l =>
      l.nonEmpty && l.length <= 63 &&
        l.forall(c => c.isLetterOrDigit && c < 128 || c == '-') &&
        l.head != '-' && l.last != '-'
    }
  }

  /** `format: "idn-hostname"` via real punycode conversion (java.net.IDN,
    * RFC 3490 with STD3 rules) then RFC 1123 label checks on the ASCII
    * form — replaces the r1 ASCII approximation. (The reference uses the
    * UTS-46/IDNA2008 `idna` crate, `format.rs` idn arm; IDNA2003 differs
    * on a few deviation characters — documented limitation.) */
  def idnHostnameValid(s: UTF8String): Boolean = {
    val str = s.toString
    if (str.isEmpty) return false
    try {
      val ascii = java.net.IDN.toASCII(str, java.net.IDN.USE_STD3_ASCII_RULES)
      asciiHostnameOk(ascii)
    } catch { case _: Exception => false }
  }

  /** `format: "idn-email"` (RFC 6531 pragmatic): non-empty local part
    * without spaces/@/control chars, internationalized domain via
    * idnHostnameValid. */
  def idnEmailValid(s: UTF8String): Boolean = {
    val str = s.toString
    val at = str.lastIndexOf('@')
    if (at <= 0 || at == str.length - 1) return false
    val local = str.substring(0, at)
    if (local.exists(c => c <= ' ' || c == '@' || c == 0x7f)) return false
    idnHostnameValid(UTF8String.fromString(str.substring(at + 1)))
  }

  /** Strict RFC 4648 base32/base32hex validity (§6/§7), matching the
    * reference's canonical `data_encoding::BASE32{,HEX}` decode
    * (`content_encoding.rs:41-63`): length ≡ 0 (mod 8), uppercase
    * alphabet, padding only in {0,1,3,4,6} trailing '=', and zero
    * leftover bits in the final symbol (canonical form). */
  def base32Valid(s: UTF8String, hexAlphabet: Boolean): Boolean = {
    val str = s.toString
    val len = str.length
    if (len % 8 != 0) return false
    if (len == 0) return true
    var pad = 0
    while (pad < len && str.charAt(len - 1 - pad) == '=') pad += 1
    if (pad == 2 || pad == 5 || pad > 6) return false
    val dataLen = len - pad
    def value(c: Char): Int =
      if (hexAlphabet) {
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'V') c - 'A' + 10
        else -1
      } else {
        if (c >= 'A' && c <= 'Z') c - 'A'
        else if (c >= '2' && c <= '7') c - '2' + 26
        else -1
      }
    var i = 0
    while (i < dataLen) {
      if (value(str.charAt(i)) < 0) return false
      i += 1
    }
    if (pad > 0) {
      // leftover bits of the last data symbol must be zero (canonical)
      val leftover = pad match { case 1 => 3; case 3 => 1; case 4 => 4; case _ => 2 }
      if ((value(str.charAt(dataLen - 1)) & ((1 << leftover) - 1)) != 0) return false
    }
    true
  }

  /** `contentSchema` assertion: validate the (decoded) string against the
    * prepared reference-faithful interpreter
    * (`keywords/content.rs:432-494`; the subschema's $refs resolve against
    * the WHOLE document, hence a Prepared with root+entry). A string that
    * is not valid JSON passes vacuously — contentMediaType reports that.
    *
    * Hot path: the fused streaming validator (Streaming.scala) — verdict
    * straight off the text, no tree. Its one asymmetry: a failing check
    * may short-circuit BEFORE a malformed region, returning false where
    * this keyword owes vacuous-true; so a stream-false re-checks grammar
    * (tree parse) to split genuinely-invalid from malformed. TRUE verdicts
    * need no re-check — a streaming pass implies the document parses. */
  def contentSchemaValid(s: UTF8String, p: graft.spec.Interp.Prepared): Boolean = {
    val text = s.toString
    try {
      if (p.isValidText(text)) true
      // stream-false: a grammar-only skip (no tree) splits genuinely
      // invalid (false) from malformed (vacuous true) — skip/parse
      // acceptance agreement is pinned by LexerDifferentialSpec
      else !graft.spec.Streaming.grammarOk(text)
    } catch { case _: java.io.IOException => true }
  }
}

/** format:"regex" validity as a codegen-capable unary expression. */
case class RegexValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    GraftFns.regexValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFns.regexValid($c)")
  override protected def withNewChildInternal(newChild: Expression): RegexValid =
    copy(child = newChild)
}

/** is_multiple_of(value: double, divisor) → boolean (exact semantics). */
case class IsMultipleOf(child: Expression, multiple: Double) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    GraftFns.isMultipleOf(input.asInstanceOf[Double], multiple)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFns.isMultipleOf($c, ${multiple}D)")
  override protected def withNewChildInternal(newChild: Expression): IsMultipleOf =
    copy(child = newChild)
}

/** idn_hostname_valid(text) / idn_email_valid(text) → boolean. */
case class IdnHostnameValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    GraftFns.idnHostnameValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFns.idnHostnameValid($c)")
  override protected def withNewChildInternal(newChild: Expression): IdnHostnameValid =
    copy(child = newChild)
}

case class IdnEmailValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    GraftFns.idnEmailValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFns.idnEmailValid($c)")
  override protected def withNewChildInternal(newChild: Expression): IdnEmailValid =
    copy(child = newChild)
}

/** base32_valid(text, hexAlphabet) → boolean (strict RFC 4648 §6/§7). */
case class Base32Valid(child: Expression, hexAlphabet: Boolean) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    GraftFns.base32Valid(input.asInstanceOf[UTF8String], hexAlphabet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFns.base32Valid($c, $hexAlphabet)")
  override protected def withNewChildInternal(newChild: Expression): Base32Valid =
    copy(child = newChild)
}

/** content_schema_valid(decodedText) → boolean via the prepared interpreter;
  * the Prepared handle rides the plan as a codegen reference object. */
case class ContentSchemaValid(child: Expression, prepared: graft.spec.Interp.Prepared)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    GraftFns.contentSchemaValid(input.asInstanceOf[UTF8String], prepared)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // binary class name: the Java type of a Scala object-nested case class
    val ref = ctx.addReferenceObj("contentSchemaPrepared", prepared,
      "graft.spec.Interp$Prepared")
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFns.contentSchemaValid($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): ContentSchemaValid =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. Spark 4 routes
  * Column↔Expression through `classic.ExpressionUtils`. */
object exprs {
  import org.apache.spark.sql.graftshim.ColumnBridge
  def toExpr(c: Column): Expression = ColumnBridge.toExpr(c)
  def toCol(e: Expression): Column = ColumnBridge.toCol(e)
  def regex_valid(c: Column): Column = toCol(RegexValid(toExpr(c)))
  def is_multiple_of(c: Column, multiple: Double): Column =
    toCol(IsMultipleOf(toExpr(c), multiple))
  def content_schema_valid(c: Column, prepared: graft.spec.Interp.Prepared): Column =
    toCol(ContentSchemaValid(toExpr(c), prepared))
  def base32_valid(c: Column, hexAlphabet: Boolean): Column =
    toCol(Base32Valid(toExpr(c), hexAlphabet))
  def idn_hostname_valid(c: Column): Column = toCol(IdnHostnameValid(toExpr(c)))
  def idn_email_valid(c: Column): Column = toCol(IdnEmailValid(toExpr(c)))
}
