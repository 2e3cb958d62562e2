package graft

import org.apache.spark.sql.SparkSession

/** Time one declared query N times under the bench's session config —
  * the single-query measurement loop used while optimizing (guide §1).
  * Usage: runMain graft.TimeQuery <query> [reps] [sfDir] [noop|collect]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQuery <query> [reps] [sfDir] [noop|collect]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val action = args.lift(3).getOrElse("collect")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-time-$name")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128 << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    if (name.startsWith("ft_")) graft.ops.FullText.indexRoot(spark, sfDir)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (action == "noop") df.write.format("noop").mode("overwrite").save()
      else df.collect()
      println(f"TIMEQ $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
