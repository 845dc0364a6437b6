package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TaggingExpression}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Identity passthrough declared non-deterministic: pins its child to the
  * projection that computes it, so filter pushdown / InferFiltersFromGenerate
  * cannot inline a SECOND copy of an expensive expression below the
  * projection (guide §4.4 — the violations explode otherwise evaluates the
  * whole check battery once in an inferred `size(...) > 0` filter and again
  * in the projection; both plan dumps in plans/r06 show the duplicated
  * expression). Values are bit-identical to the child's; the child stays
  * deterministic internally, so nothing about the RESULT changes — only
  * where the optimizer is allowed to re-evaluate it. */
case class OnceBarrier(child: Expression) extends TaggingExpression {
  override lazy val deterministic: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): OnceBarrier =
    copy(child = newChild)
}

object OnceBarrier {
  def once(c: Column): Column = ColumnBridge.toCol(OnceBarrier(ColumnBridge.toExpr(c)))
}
