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

/** Column-level entry points for the custom expressions. Spark 4 routes
  * Column↔Expression through `classic.ExpressionUtils`. */
object exprs {
  import org.apache.spark.sql.graftshim.ColumnBridge
  def toExpr(c: Column): Expression = ColumnBridge.toExpr(c)
  def toCol(e: Expression): Column = ColumnBridge.toCol(e)
  def regex_valid(c: Column): Column = toCol(RegexValid(toExpr(c)))
}
