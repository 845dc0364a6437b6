package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.audio.ClipsGen.generate(spark, 100, 2).toDF()
    val plan = graft.audio.AudioChecks.fullPlan(df.schema)
    val st = graft.audio.expressions.pcm_stats(col("bytes"), col("codec"))
    val gated = df
      .where(plan.isValidCol)
      .withColumn("_st", st)
      .where(col("_st").isNotNull &&
        col("_st.rms_dbfs") > -60.0 && col("_st.clip_frac") < 0.01)
      .where(graft.text.TextOps.tokenCount(col("transcript")) >= 2)
      .withColumn("_fp", graft.text.TextOps.fingerprint(col("transcript")))
      .select(col("clip_id"), col("codec"), col("dur_ms"),
        col("_st.rms_dbfs").as("_rms"), col("_fp"))
    val keep = gated
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_fp")).orderBy(col("clip_id"))))
      .where(col("_rk") === 1)
    val agg = keep.groupBy("codec").agg(count(lit(1)).as("n"),
      avg(col("_rms")), avg(col("dur_ms")))
    val p = agg.queryExecution.optimizedPlan.toString
    System.err.println("pcmstats in optimized plan: " + "pcmstats".r.findAllIn(p.toLowerCase).size)
    System.err.println("audiosnr in optimized plan: " + "audiosnr".r.findAllIn(p.toLowerCase).size)
    System.err.println("textstats in optimized plan: " + "text_stats|textstats".r.findAllIn(p.toLowerCase).size)
    spark.stop()
  }
}
