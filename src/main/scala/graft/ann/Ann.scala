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

  // ---- IVF (inverted-file) index ---------------------------------------

  /** Spherical k-means coarse quantizer trained with Lloyd iterations
    * expressed as DataFrame aggregations — no driver-side data beyond the
    * nLists×dim centroid matrix (a few KB). Deterministic: seeded init by
    * hash-ordered sample, fixed iteration count.
    *
    * Per iteration: one pass assigning each vector to its max-dot centroid
    * (compiled dot kernels; the scores array is codegen'd), one
    * (list, dimension) shuffle to average members, then centroids are
    * re-normalized on the driver (spherical k-means ⇒ dot ≡ cosine on
    * normalized inputs). Empty lists keep their previous centroid. */
  def ivfTrain(df: DataFrame, idCol: String, vecCol: String,
               nLists: Int, iters: Int = 5, seed: Long = 42L): Array[Array[Double]] = {
    val src = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    def normalize(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var centroids: Array[Array[Double]] = src
      .orderBy(xxhash64(col("id"), lit(seed)))
      .limit(nLists)
      .select(col("v")).collect()
      .map(r => normalize(r.getSeq[Float](0).map(_.toDouble).toArray))
    for (_ <- 1 to iters) {
      val assigned = src.withColumn("list_id", nearestList(col("v"), centroids))
      val sums = assigned
        .select(col("list_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos")
        .agg(sum(col("x")).as("s"))
        .collect()
      val next = centroids.map(_.clone())
      val touched = Array.fill(centroids.length)(false)
      sums.foreach { r =>
        val l = r.getInt(0); val p = r.getInt(1)
        if (!touched(l)) { java.util.Arrays.fill(next(l), 0.0); touched(l) = true }
        next(l)(p) = r.getDouble(2)
      }
      centroids = next.zipWithIndex.map { case (c, i) =>
        if (touched(i)) normalize(c) else centroids(i)
      }
    }
    centroids
  }

  /** argmax-dot list id for a vector column against the centroid matrix:
    * an array of compiled dot kernels + codegen'd array_position. For very
    * large nLists this becomes its own kernel; at the typical sqrt(N)
    * coarse-list count the expression form stays in codegen. */
  def nearestList(vecCol: Column, centroids: Array[Array[Double]]): Column = {
    val scores = array(centroids.map(c => dot(vecCol, typedlit(c.toSeq))): _*)
    (array_position(scores, array_max(scores)) - 1).cast(IntegerType)
  }

  /** Assignment for writing: at 100TB the assigned table is PARTITIONED BY
    * list_id, so an nProbe query scans only nProbe/nLists of the data —
    * partition pruning, not just a scan filter. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("list_id", nearestList(col(vecCol), centroids))

  /** IVF top-k: probe the `nProbe` lists whose centroids are nearest to
    * the query (computed on the driver — nLists dots), exact compiled
    * cosine inside the probed lists only, TakeOrdered for the top k. */
  def ivfTopK(assigned: DataFrame, idCol: String, vecCol: String,
              centroids: Array[Array[Double]], query: Array[Float],
              k: Int, nProbe: Int): DataFrame = {
    val qd = query.map(_.toDouble)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i, c.zip(qd).map { case (x, y) => x * y }.sum) }
      .sortBy(-_._2).take(nProbe).map(_._1)
    val q = typedlit(query.toSeq)
    assigned
      .where(col("list_id").isin(probes.toIndexedSeq: _*))
      .select(col(idCol).as("id"), round(cosine(col(vecCol), q), 4).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
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
