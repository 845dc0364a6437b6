package graft.cli

import org.apache.spark.sql.SparkSession
import graft.run.Validation

/** CLI driver — the analog of `jsonschema-cli`
  * (`/root/reference/crates/jsonschema-cli/src/main.rs:34-239`): read a
  * table, validate against a spec, emit verdicts + violations; exit code =
  * validity. On a cluster this main is launched via spark-submit; here it
  * runs in local mode.
  *
  * Usage: graft.cli.Main <table.parquet> <spec.json> [outDir] [keyCol]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.cli.Main <table.parquet> <spec.json> [outDir] [keyCol]")
      sys.exit(2)
    }
    val tablePath = args(0)
    val specPath = args(1)
    val outDir = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-validate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = spark.read.parquet(tablePath)
      val specJson = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(specPath)), "UTF-8")
      val plan = Validation.compile(specJson, df.schema)
      val keyCol = args.lift(3).getOrElse(df.columns.head)

      val verdicts = plan.verdicts(df).orderBy("partition_id")
      println("== per-partition verdicts ==")
      verdicts.show(100, truncate = false)

      val violations = plan.violations(df, Seq(keyCol))
      println("== violations (sample) ==")
      violations.show(20, truncate = false)

      val stats = plan.checkStats(df)
      println("== per-check violation counts ==")
      stats.show(100, truncate = false)

      outDir.foreach { d =>
        violations.write.mode("overwrite").parquet(s"$d/violations")
        verdicts.write.mode("overwrite").parquet(s"$d/verdicts")
      }
      val allValid = plan.isValid(df)
      println(s"valid: $allValid")
      spark.stop()
      sys.exit(if (allValid) 0 else 1)
    } catch {
      case e: graft.spec.SpecError =>
        System.err.println(s"invalid spec: ${e.getMessage}")
        spark.stop(); sys.exit(2)
    }
  }
}
