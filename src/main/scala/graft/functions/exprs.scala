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

/** Column-level entry points for the custom expressions. Spark 4 routes
  * Column↔Expression through `classic.ExpressionUtils`. */
object exprs {
  import org.apache.spark.sql.graftshim.ColumnBridge
  def toExpr(c: Column): Expression = ColumnBridge.toExpr(c)
  def toCol(e: Expression): Column = ColumnBridge.toCol(e)
  def regex_valid(c: Column): Column = toCol(RegexValid(toExpr(c)))
  def is_multiple_of(c: Column, multiple: Double): Column =
    toCol(IsMultipleOf(toExpr(c), multiple))
}
