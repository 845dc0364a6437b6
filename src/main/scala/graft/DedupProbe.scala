package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** r06 sub-step timings of the minhash query path. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[dedup] $name%-26s min=${ts.min}%.2fs reps=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }
    timed("minhash_op_only") {
      TextOps.minhashNearDups(docs, "doc_id", "text", n = 3, k = 64,
        rowsPerBand = 4, threshold = 0.12).count()
    }
    timed("ngram_op_only") {
      TextOps.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.12).count()
    }
    timed("full_query") {
      SparkEntry.queries("q_docs_minhash_lsh")(spark, "/root/testdata/sf0.1").count()
    }
    timed("decision_agg_only") {
      docs.select(col("doc_id").as("id"), col("text"))
        .agg(count(lit(1)), approx_count_distinct(TextOps.fingerprint64(col("text")))).collect()
    }
    timed("shingle_persist_only") {
      val d = graft.functions.Spread.toCores(docs.select(col("doc_id").as("id"), col("text")))
        .select(col("id"), graft.functions.vecexprs.ngram_shingles(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0).persist()
      d.count(); d.unpersist(true)
    }
    spark.stop()
  }
}
