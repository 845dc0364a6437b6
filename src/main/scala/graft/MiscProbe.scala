package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch probes for round-6 optimization A/Bs (not part of the bench
  * contract). */
object MiscProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "4").toInt
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

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[misc] $name%-34s min=${ts.min}%.2fs reps=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }

    val clips = spark.read.parquet(Bench.clipsFixture(spark, 200000, cpus.toInt * 4))

    timed("uniq_salted (current)") {
      graft.table.TableChecks.uniquenessViolations(clips, Seq("clip_id")).count()
    }
    timed("uniq_plain_groupby") {
      clips.select("clip_id").groupBy("clip_id").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1).count()
    }
    timed("uniq_salt_partid") {
      clips.select(col("clip_id"), spark_partition_id().as("_salt"))
        .groupBy("clip_id", "_salt").agg(count(lit(1)).as("_partial"))
        .groupBy("clip_id").agg(sum(col("_partial")).as("cnt"))
        .where(col("cnt") > 1).count()
    }
    timed("uniq_scan_only") {
      clips.select("clip_id").agg(count(col("clip_id"))).collect()
    }

    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def nestedFrom(src: org.apache.spark.sql.DataFrame) = src.select(
      struct(
        col("l_quantity").as("qty"),
        array(col("l_returnflag"), col("l_linestatus")).as("flags"),
        array(col("l_discount"), col("l_tax")).as("rates")).as("item"))
    val spec = """{
      "properties": {
        "item": {
          "type": "object",
          "required": ["qty"],
          "properties": {
            "qty": {"type": "number", "minimum": 1, "maximum": 50},
            "flags": {
              "type": "array", "minItems": 2, "maxItems": 2, "uniqueItems": true,
              "items": {"type": "string", "minLength": 1, "maxLength": 1,
                        "enum": ["A", "N", "R", "O", "F"]},
              "contains": {"const": "O"}
            },
            "rates": {
              "type": "array", "uniqueItems": true,
              "items": {"minimum": 0, "maximum": 0.06}
            }
          }
        }
      }
    }"""
    val nested0 = nestedFrom(li)
    val plan = graft.run.Validation.compile(spec, nested0.schema)
    timed("nested_checkstats (current)") {
      plan.checkStats(nested0).collect()
    }
    val nestedSpread = nestedFrom(li.select("l_quantity", "l_returnflag",
      "l_linestatus", "l_discount", "l_tax").repartition(cpus.toInt))
    timed("nested_checkstats_spread_narrow") {
      plan.checkStats(nestedSpread).collect()
    }
    spark.stop()
  }
}
