package graft

import org.apache.spark.sql.SparkSession

/** Dump full `explain("formatted")` output for declared queries into
  * per-query files — the optimization rounds' before/after plan evidence
  * (`plans/r<NN>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> [sfDir] [query ...]
  * (no query names = every declared query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val tag = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 3) args.drop(3).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        println(s"wrote $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable => println(s"SKIP $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
