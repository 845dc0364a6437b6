package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ann.Ann

/** Dev probe: stage-by-stage timing of the low-threshold sign-LSH path. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def timed(name: String)(f: => Long): Unit = {
      (1 to 2).foreach(_ => f)
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
    }
    val (bits, bands) = Ann.deriveLshParams(0.4, 0.95)
    timed("banded (kernel+posexplode)") {
      emb.select(col("vec_id"),
        posexplode(graft.functions.vecexprs.sign_lsh_buckets(col("embedding"), 64, bits, bands, 42L))
          .as(Seq("band", "bucket"))).count()
    }
    timed("candidates (capped+selfjoin+distinct)") {
      Ann.lshCandidatePairs(emb, "vec_id", "embedding", 64, bits, bands).count()
    }
    timed("nearDups full (cand+fetch+cosine)") {
      Ann.cosineNearDups(emb, "vec_id", "embedding", 64, threshold = 0.4).count()
    }
    timed("exact") {
      Ann.cosineNearDupsExact(emb, "vec_id", "embedding", 0.4).count()
    }
    spark.stop()
  }
}
