package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, MutableProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.classic.SparkSession

/** Analyzer access for STANDALONE bound expressions (r06): the compiled
  * array-keyword element predicates are Column trees over a
  * `BoundReference`, built outside any DataFrame — they never pass
  * through the Dataset analysis path, so the Spark-4 ColumnNode →
  * Expression conversion, implicit type coercion (int literal vs double
  * element, timezone binding on casts) and RuntimeReplaceable elimination
  * have not been applied. This shim runs the active session's converter
  * and analyzer over a one-expression projection and proves the result
  * evaluable by building a MutableProjection once on the driver. Returns
  * None on ANY failure — callers fall back to the higher-order-function
  * form, so this is strictly an optimization. */
object ExprAnalyze {
  def coerceBound(c: Column): Option[Expression] =
    try {
      val spark = SparkSession.active
      val e = spark.expression(c)
      val plan = Project(Seq(Alias(e, "_p")()), LocalRelation(Nil))
      val analyzed = spark.sessionState.analyzer.execute(plan)
      val replaced =
        org.apache.spark.sql.catalyst.optimizer.ReplaceExpressions(analyzed)
      replaced match {
        case Project(Seq(a: Alias), _) if a.child.resolved =>
          val out = a.child
          MutableProjection.create(Seq(out)) // driver-side evaluability proof
          Some(out)
        case _ => None
      }
    } catch { case _: Throwable => None }
}
