package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data pipelines: reproducible
  * train/validation splits and per-group quotas, keyed by a stable hash of
  * the row id — the same row lands in the same split on every run, every
  * engine, and every table scale (no RNG state, no `rand()` non-determinism
  * across retried tasks — a classic correctness trap in Spark sampling).
  *
  * The hash is md5 (not xxhash64) so external engines can reproduce the
  * assignment bit-for-bit for audits (same reasoning as
  * [[TextOps.fingerprint]]).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the FIRST 8 md5 hex digits of
    * (salt || id) — deterministic, engine-reproducible. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), id.cast(StringType))), 1, 8), 16, 10)
      .cast(LongType) % buckets

  /** Split assignment by per-mille threshold: "train" below, "val" at or
    * above. `perMilleTrain`=950 ⇒ ~95% train, exactly reproducible. */
  def splitAssign(id: Column, perMilleTrain: Int, salt: String = ""): Column =
    when(hashBucket(id, 1000, salt) < perMilleTrain, lit("train")).otherwise(lit("val"))

  /** Deterministic fractional sample: keeps rows whose bucket falls under
    * `perMille`. Map-only — no shuffle, no RNG. */
  def sampleByHash(df: DataFrame, idCol: String, perMille: Int,
                   salt: String = ""): DataFrame =
    df.where(hashBucket(col(idCol), 1000, salt) < perMille)

  /** Per-group quota sampling: at most `quota` rows per group, chosen by
    * hash order (stable under reruns and insertion order). One shuffle on
    * the group key; groups larger than the quota truncate — the stratified
    * downsampling step of a pipeline ("at most N docs per domain"). */
  def sampleQuotaPerGroup(df: DataFrame, groupCol: String, idCol: String,
                          quota: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000000, salt), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= quota)
      .drop("_rk")
  }
}
