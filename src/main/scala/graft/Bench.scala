package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.audio.{AudioChecks, ClipsGen}
import graft.table.TableChecks

/** Per-round benchmark main (driver contract): headline queries on
  * SPARK_GRAFT_SF_DIR plus the flagship clips-validation throughput
  * (north-rule metric: validated clips/sec, full constraint suite).
  * Prints ONE JSON line. */
object Bench {

  /** Clips parquet fixture (generated once per (n, seed), reused). The
    * benchmark then measures VALIDATION cost from parquet, not synthesis. */
  def clipsFixture(spark: SparkSession, n: Long, partitions: Int): String = {
    val path = s"/tmp/graft_bench/clips_n${n}_p$partitions"
    val ok = new java.io.File(s"$path/_SUCCESS").exists()
    if (!ok) {
      ClipsGen.generate(spark, n, partitions, corruptionRate = 0.01)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** The full clips constraint suite, forced end-to-end: row-level scalar +
    * audio checks, violation rows, per-partition verdicts, uniqueness. */
  def validateClips(spark: SparkSession, path: String): Long = {
    val df = spark.read.parquet(path)
    val plan = AudioChecks.fullPlan(df.schema)
    val validated = plan.withValidation(df)
    // one pass: per-partition verdicts + violation counts
    val agg = validated.agg(
      count(lit(1)).as("rows"),
      sum(when(!col("valid"), 1L).otherwise(0L)).as("invalid"),
      sum(size(col("violations"))).as("violations"))
    val row = agg.collect()(0)
    // uniqueness (salted) — part of the suite
    TableChecks.uniquenessViolations(df, Seq("clip_id")).count()
    row.getAs[Long]("rows")
  }

  /** Audio-quality profile: one decode pass per clip (pcm_stats kernel),
    * aggregated per codec — loudness / clipping / silence / ZCR, the audio
    * analog of the text quality features. */
  def audioQualityProfile(spark: SparkSession, path: String): Long = {
    val df = spark.read.parquet(path)
    val st = graft.audio.expressions.pcm_stats(col("bytes"), col("codec"))
    df.select(col("codec"), st.as("st"))
      .groupBy("codec")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("st").isNull, 1L).otherwise(0L)).as("undecodable"),
        avg(col("st.rms_dbfs")).as("avg_rms_dbfs"),
        avg(col("st.zcr")).as("avg_zcr"),
        max(col("st.clip_frac")).as("max_clip_frac"),
        sum(when(col("st.rms_dbfs") < -60.0, 1L).otherwise(0L)).as("near_silent"))
      .count()
  }

  /** The INTEGRATED training-data pipeline over the north-rule clips
    * table, end to end in one composed plan: constraint validation →
    * audio-quality gating (decoded-PCM stats) → transcript text-quality →
    * exact transcript dedup keeping one clip per fingerprint → per-codec
    * survivor stats. What a user of this engine actually ships. */
  def clipsPipeline(spark: SparkSession, path: String): Long = {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(path)
    val plan = AudioChecks.fullPlan(df.schema)
    val st = graft.audio.expressions.pcm_stats(col("bytes"), col("codec"))
    val gated = df
      .where(plan.isValidCol)
      .withColumn("_st", st)
      .where(col("_st").isNotNull &&
        col("_st.rms_dbfs") > -60.0 && col("_st.clip_frac") < 0.01)
      .where(graft.text.TextOps.tokenCount(col("transcript")) >= 2)
      .withColumn("_fp", graft.text.TextOps.fingerprint(col("transcript")))
      // the dedup window must NOT shuffle audio payloads: project down to
      // the columns the rest of the pipeline needs before the exchange
      .select(col("clip_id"), col("codec"), col("dur_ms"),
        col("_st.rms_dbfs").as("_rms"), col("_fp"))
    // keep the min clip_id per transcript fingerprint (deterministic)
    val keep = gated
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_fp")).orderBy(col("clip_id"))))
      .where(col("_rk") === 1)
    keep.groupBy("codec").agg(
      count(lit(1)).as("n"),
      avg(col("_rms")).as("avg_rms_dbfs"),
      avg(col("dur_ms")).as("avg_dur_ms"))
      .count()
  }

  /** The reference's headline "Recursive" benchmark mirrored at table
    * scale: every row carries a ~4.7 KB nested-dictionary JSON document
    * (vendored `crates/benchmark/data/recursive_instance.json`, made
    * row-unique) validated against the recursive `#/definitions` schema
    * via the prepared-interpreter kernel — the path a user takes for
    * dynamic JSON columns. */
  def recursiveFixture(spark: SparkSession, n: Long, partitions: Int): String = {
    val path = s"/tmp/graft_bench/recursive_n$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val instance = new String(
        getClass.getResourceAsStream("/bench/recursive_instance.json").readAllBytes(), "UTF-8")
      spark.range(0, n, 1, partitions)
        .select(regexp_replace(lit(instance), lit("term1"),
          concat(lit("term"), col("id"))).as("doc"))
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  def validateRecursive(spark: SparkSession, path: String): Long = {
    val schema = new String(
      getClass.getResourceAsStream("/bench/recursive_schema.json").readAllBytes(), "UTF-8")
    val prepared = graft.spec.Interp.prepare(graft.spec.Spec.parseJson(schema))
    spark.read.parquet(path)
      .where(graft.functions.exprs.content_schema_valid(col("doc"), prepared))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nClips = sys.env.getOrElse("SPARK_GRAFT_CLIPS", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // explicit partition sizing so the clips scan yields >= cores splits
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val clipsPath = clipsFixture(spark, nClips, cpus.toInt * 4)
    // warm the JVM/codegen once with a small slice
    validateClips(spark, clipsPath) // warmup (reads full set once)
    // min of two timed runs: the shared microVM shows CPU-steal bursts,
    // and min-of-reps is the steal-robust estimator (BENCH_SCALING.md)
    var rows = 0L
    val clipSec = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      rows = validateClips(spark, clipsPath)
      (System.nanoTime() - t0) / 1e9
    }.min
    val clipsPerSec = rows / clipSec

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val status = scala.collection.mutable.LinkedHashMap[String, String]()
    results("clips_full_suite") = clipSec
    status("clips_full_suite") = "ok"
    results("clips_audio_quality") = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      audioQualityProfile(spark, clipsPath)
      (System.nanoTime() - t0) / 1e9
    }.min
    status("clips_audio_quality") = "ok"
    results("clips_pipeline") = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      clipsPipeline(spark, clipsPath)
      (System.nanoTime() - t0) / 1e9
    }.min
    status("clips_pipeline") = "ok"
    // reference headline "Recursive": 40k nested docs, prepared interpreter
    val recPath = recursiveFixture(spark, 40000, cpus.toInt * 2)
    validateRecursive(spark, recPath) // warmup
    results("recursive_dynref_40k") = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val ok = validateRecursive(spark, recPath)
      require(ok == 40000L, s"recursive validation regressed: $ok/40000 valid")
      (System.nanoTime() - t0) / 1e9
    }.min
    status("recursive_dynref_40k") = "ok"
    // min over reps: steal-robust estimator on the shared microVM
    // (BENCH_SCALING.md); a crashing query must NOT report as a fast
    // time — its status is recorded and the full rep time counts
    val reps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "2").toInt
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t = System.nanoTime()
        try { fn(spark, sfDir).count(); status(name) = "ok" }
        catch { case e: Throwable =>
          status(name) = s"error:${e.getClass.getSimpleName}"
          System.err.println(s"[bench] $name failed: $e")
        }
        (System.nanoTime() - t) / 1e9
      }
      results(name) = times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val st = status.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = results.values.sum
    val nErr = status.values.count(_ != "ok")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"status":$st,"n_errors":$nErr,"sf":"$sfDir","clips":$rows,"clips_per_sec":$clipsPerSec%.0f}""")
    spark.stop()
  }
}
