package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.run.ValidationPlan

/** Running per-key totals carried across micro-batches. */
final case class KeyState(rows: Long, violations: Long)

/** Cumulative per-key verdict emitted each micro-batch. */
final case class KeyVerdict(key: String, rows: Long, violations: Long, alert: Boolean)

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

  /** CUSTOM-STATE verdicts: cumulative per-key row/violation totals carried
    * across micro-batches via `mapGroupsWithState` — the pattern for
    * semantics no windowed aggregation expresses (here: "alert once a key
    * has accumulated more than `alertThreshold` violations over the life
    * of the stream"). State is per-key O(1); use `update` output mode. */
  def statefulKeyVerdicts(stream: DataFrame, plan: ValidationPlan,
                          keyCol: String, alertThreshold: Long): Dataset[KeyVerdict] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string").as("key"),
        size(plan.violationsCol).cast("long").as("vio"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KeyState, KeyVerdict](GroupStateTimeout.NoTimeout) {
        (key, batchRows, state) =>
          var rows = 0L; var vios = 0L
          batchRows.foreach { case (_, v) => rows += 1; vios += v }
          val prev = state.getOption.getOrElse(KeyState(0L, 0L))
          val next = KeyState(prev.rows + rows, prev.violations + vios)
          state.update(next)
          KeyVerdict(key, next.rows, next.violations, next.violations > alertThreshold)
      }
  }
}
