package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Baseline: brute-force cosine top-k (distributed
  * TakeOrdered — no global sort). Scale path: sign-LSH (random
  * hyperplanes) bucketing so candidate generation shuffles on a small
  * bucket key instead of crossing the table with itself.
  */
object Ann {

  /** Dot product / cosine via compiled tight-loop kernels (double
    * accumulation, sequential left fold ⇒ reproducible in any engine
    * folding the same way). Spark's aggregate/zip_with HOFs are
    * interpreted per element — far too slow for 100TB-scale scoring. */
  def dot(a: Column, b: Column): Column =
    graft.functions.vecexprs.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    graft.functions.vecexprs.cosine_sim(a, b)

  /** Brute-force top-k by cosine against one query vector. The per-row
    * score is a codegen'd expression; `orderBy().limit(k)` plans as
    * TakeOrderedAndProject (per-partition heap + driver merge of k·P
    * rows, never a full shuffle/sort). */
  def topKCosine(df: DataFrame, vecCol: String, idCol: String,
                 query: Array[Float], k: Int): DataFrame = {
    val q = typedlit(query.toSeq)
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded). */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: `bits` random hyperplanes → one bit each (sign of
    * the projection). Vectors in the same bucket are near-ish in angle. */
  def lshBucket(vecCol: Column, dim: Int, bits: Int = 12, seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, bits, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(vecCol, typedlit(p.toSeq))
      when(proj >= 0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
  }

  /** ANN near-duplicate pairs via MULTI-BAND sign-LSH: `bands` independent
    * bucket keys per vector; a pair is a candidate if ANY band matches
    * (miss probability per band ≈ bits·θ/π for angle θ, so recall ≈
    * 1-(bits·θ/π)^bands — a single band has NO recall guarantee). The
    * self-join shuffles on the small (band, bucket) key — bucket-local,
    * never crossing the table with itself; survivors are verified with
    * exact compiled cosine, so precision is exact. */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double = 0.9, bits: Int = 12, bands: Int = 4,
                     seed: Long = 42L): DataFrame = {
    val src = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = src.select(col("id"), col("v"),
      explode(array((0 until bands).map(bd =>
        struct(lit(bd).as("band"),
          lshBucket(col("v"), dim, bits, seed + bd * 7919L).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("_cos"))
      .dropDuplicates("id_a", "id_b")
      .where(col("_cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_cos"), 4).as("cos"))
  }

  /** EXACT embedding near-duplicate pairs: all-pairs cosine >= threshold.
    * Quadratic — the oracle/small-table path (plans as a broadcast nested
    * loop at test scale); `cosineNearDups` above is the LSH-bucketed scale
    * path whose candidates never cross the whole table with itself. */
  def cosineNearDupsExact(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val s = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val a = s.alias("a"); val b = s.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("_cos"))
      // threshold on the UNROUNDED score (rounding first would admit
      // pairs just below the threshold), report rounded
      .where(col("_cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_cos"), 4).as("cos"))
  }

  /** ANN top-k with LSH pre-filter: score only vectors whose bucket is
    * within `probeHamming` bits of the query's bucket (multi-probe),
    * then exact cosine on the survivors. Falls back to brute force
    * recall-wise only within the probed buckets — the 100TB path where
    * scoring every row is off the table. */
  def topKCosineLsh(df: DataFrame, vecCol: String, idCol: String,
                    query: Array[Float], k: Int, dim: Int,
                    bits: Int = 12, probeHamming: Int = 2, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val proj = p.zip(query).map { case (x, y) => x * y.toDouble }.sum
      if (proj >= 0d) 1L << i else 0L
    }.sum
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, bits, seed))
      // partition-prunable pre-filter: cheap bit_count on the bucket key
      .where(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
    val q = typedlit(query.toSeq)
    bucketed.select(col("id"), round(cosine(col("v"), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }
}
