package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.run.ValidationPlan

/** Structured Streaming lift of the validation plan: the row-level checks
  * are stateless Column expressions, so they apply to a streaming
  * DataFrame unchanged; verdict aggregation becomes watermarked windowed
  * aggregation (the per-partition flag verdict's streaming analog).
  */
object StreamingValidation {

  /** Stream-side evaluate-list: adds `valid` + `violations` (stateless). */
  def withValidation(stream: DataFrame, plan: ValidationPlan): DataFrame =
    plan.withValidation(stream)

  /** Windowed verdict stream: per (window, group) pass/fail + counts.
    * `tsCol` drives the watermark (late data beyond `lateness` is
    * dropped from the verdict, never double-counted). */
  def windowedVerdicts(stream: DataFrame, plan: ValidationPlan,
                       tsCol: String, windowDur: String,
                       lateness: String = "10 minutes"): DataFrame =
    stream
      .withColumn("valid", plan.isValidCol)
      // watermarks require TIMESTAMP (parquet often lands as TIMESTAMP_NTZ)
      .withColumn("_event_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_event_ts", lateness)
      .groupBy(window(col("_event_ts"), windowDur))
      .agg(
        every(col("valid")).as("pass"),
        count(lit(1)).as("rows"),
        sum(when(!col("valid"), 1L).otherwise(0L)).as("invalid_rows"))

  /** Violation-row stream (append-mode friendly: stateless explode). */
  def violationStream(stream: DataFrame, plan: ValidationPlan,
                      keyCols: Seq[String]): DataFrame =
    plan.violations(stream, keyCols)
}
