package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Guide §1.4 noop-sink isolation probes for the clips family: separates
  * the parquet-scan floor from the validation compute so kernel wins are
  * attributable. NOT part of the driver bench contract (Bench.scala is
  * frozen); numbers are cited in OPTIMIZATION_r06.md. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nClips = sys.env.getOrElse("SPARK_GRAFT_CLIPS", "200000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = Bench.clipsFixture(spark, nClips, cpus.toInt * 4)

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[extra] $name%-28s min=${ts.min}%.2fs reps=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }

    val df = spark.read.parquet(path)
    spark.sparkContext.setJobDescription("extra: full-column noop scan")
    timed("scan_all_cols_noop") {
      df.write.format("noop").mode("overwrite").save()
    }
    spark.sparkContext.setJobDescription("extra: bytes-length agg (scan floor)")
    timed("scan_bytes_len_agg") {
      df.agg(sum(length(col("bytes")))).collect()
    }
    spark.sparkContext.setJobDescription("extra: decode+stats only (pcm_stats)")
    timed("pcm_stats_only") {
      df.select(graft.audio.expressions.pcm_stats(col("bytes"), col("codec")).as("st"))
        .agg(sum(col("st.n_samples"))).collect()
    }
    spark.sparkContext.setJobDescription("extra: decode+synth+snr only")
    timed("audio_snr_only") {
      df.select(graft.audio.expressions.audio_snr(col("clip_id"), col("bytes"),
          col("codec"), col("sr_hz"), col("dur_ms")).as("snr"))
        .agg(sum(when(col("snr") >= 30.0, 1L).otherwise(0L))).collect()
    }
    spark.sparkContext.setJobDescription("extra: validation agg pass only")
    timed("validate_agg_only") {
      val plan = graft.audio.AudioChecks.fullPlan(df.schema)
      val validated = plan.withValidation(df)
      validated.agg(
        count(lit(1)).as("rows"),
        sum(when(!col("valid"), 1L).otherwise(0L)).as("invalid"),
        sum(size(col("violations"))).as("violations")).collect()
    }
    spark.sparkContext.setJobDescription("extra: isValid agg only (no violations)")
    timed("isvalid_agg_only") {
      val plan = graft.audio.AudioChecks.fullPlan(df.schema)
      df.agg(sum(when(plan.isValidCol, 1L).otherwise(0L))).collect()
    }
    spark.sparkContext.setJobDescription("extra: uniqueness pass only")
    timed("uniqueness_only") {
      graft.table.TableChecks.uniquenessViolations(df, Seq("clip_id")).count()
    }
    spark.sparkContext.setJobDescription("extra: full validateClips")
    timed("validate_clips_full") { Bench.validateClips(spark, path) }
    spark.sparkContext.setJobDescription("extra: clips pipeline")
    timed("clips_pipeline") { Bench.clipsPipeline(spark, path) }
    spark.sparkContext.setJobDescription(null)
    spark.stop()
  }
}
