package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitAssign is deterministic across runs and roughly proportional") {
    val df = spark.range(0, 10000).toDF("id")
    val a = df.select(col("id"), Sampling.splitAssign(col("id"), 900, "s").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = df.select(col("id"), Sampling.splitAssign(col("id"), 900, "s").as("sp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // reproducible
    val trainFrac = a.values.count(_ == "train") / 10000.0
    assert(math.abs(trainFrac - 0.9) < 0.02, trainFrac)
    // different salt → different assignment (independence across uses)
    val c = df.select(Sampling.splitAssign(col("id"), 900, "other").as("sp"))
      .collect().map(_.getString(0))
    assert(a.toSeq.sortBy(_._1).map(_._2) != c.toSeq)
  }

  test("sampleByHash keeps a stable subset of the requested size") {
    val df = spark.range(0, 5000).toDF("id")
    val kept = Sampling.sampleByHash(df, "id", 250, "z").collect().map(_.getLong(0)).toSet
    assert(math.abs(kept.size - 1250) < 120, kept.size)
    // subset property: a smaller perMille is a subset of a larger one
    val keptSmall = Sampling.sampleByHash(df, "id", 100, "z").collect().map(_.getLong(0)).toSet
    assert(keptSmall.subsetOf(kept))
  }

  test("sampleQuotaPerGroup caps each group and is order-insensitive") {
    val df = Seq.tabulate(300)(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val out = Sampling.sampleQuotaPerGroup(df, "grp", "id", quota = 7)
    val byGroup = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup.values.forall(_ == 7L), byGroup)
    // shuffled input selects the SAME rows (hash order, not input order)
    val shuffled = df.orderBy(rand(123))
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sampleQuotaPerGroup(shuffled, "grp", "id", quota = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }
}
