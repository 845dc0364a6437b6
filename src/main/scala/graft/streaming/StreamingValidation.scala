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

  /** Streaming DRIFT detection: per event-time window, a fixed-bucket
    * histogram as conditional aggregates (state per window is O(buckets),
    * never per-row), then PSI and KS against a static baseline histogram
    * as pure post-aggregation expressions — the streaming analog of
    * `TableChecks.driftCheck`, identical math (zero-zero buckets
    * contribute exactly 0 to PSI under the shared eps floor, so the fixed
    * bucket range and the batch path's observed-key union agree).
    * Append-safe: one row per closed window under the watermark. */
  def windowedDrift(stream: DataFrame, tsCol: String, valueCol: String,
                    lo: Double, hi: Double, buckets: Int,
                    baseline: Map[Long, Long], windowDur: String,
                    lateness: String = "10 minutes",
                    psiMax: Double = 0.2, eps: Double = 1e-6): DataFrame = {
    require(hi > lo && buckets > 0)
    import org.apache.spark.sql.types.DoubleType
    val w = (hi - lo) / buckets
    val ids: Seq[Long] = -1L +: (0L until buckets.toLong) :+ buckets.toLong
    val bucketExpr = when(col(valueCol).isNull, lit(null))
      .when(col(valueCol) < lo, lit(-1L))
      .when(col(valueCol) >= hi, lit(buckets.toLong))
      .otherwise(floor((col(valueCol) - lit(lo)) / lit(w)))
      .cast("long")
    val counts = ids.map(i => sum(when(col("_b") === i, 1L).otherwise(0L)).as(s"_c$i"))
    val agged = stream
      .withColumn("_event_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_event_ts", lateness)
      .withColumn("_b", bucketExpr)
      .where(col("_b").isNotNull)
      .groupBy(window(col("_event_ts"), windowDur))
      .agg(counts.head, counts.tail: _*)
    val total = ids.map(i => col(s"_c$i")).reduce(_ + _)
    val totD = greatest(total.cast(DoubleType), lit(1.0))
    val bTot = baseline.values.sum.toDouble.max(1)
    def pRaw(i: Long) = col(s"_c$i").cast(DoubleType) / totD
    def pEps(i: Long) = greatest(pRaw(i), lit(eps))
    val q = ids.map(i => i -> math.max(baseline.getOrElse(i, 0L) / bTot, eps)).toMap
    val psiExpr = ids.map { i =>
      (pEps(i) - lit(q(i))) * log(pEps(i) / lit(q(i)))
    }.reduce(_ + _)
    // KS: max |ΔCDF| over the fixed bucket order (raw probabilities)
    val qCdf = ids.scanLeft(0.0) { (acc, i) => acc + baseline.getOrElse(i, 0L) / bTot }.tail
    val pCdf = ids.indices.map(k => ids.take(k + 1).map(pRaw).reduce(_ + _))
    val ksExpr = greatest(pCdf.zip(qCdf).map { case (p, c) => abs(p - lit(c)) }: _*)
    agged.select(col("window"), total.as("rows"),
      round(psiExpr, 6).as("psi"), round(ksExpr, 6).as("ks"),
      (psiExpr <= psiMax).as("pass"))
  }

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
