package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must run green on sf0.001 (the driver smoke). */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0)
    }
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
