package graft

import org.apache.spark.sql.SparkSession

/** Supplementary benchmark (guide §1.4): times every headliner query
  * through the NOOP sink — computing every column of every row with no
  * collect/driver transfer — with 3 reps per entry and a tmpfs bandwidth
  * probe before and after each, so a degraded-host window is visible in
  * the numbers themselves (round-5 verdict ask #2; `graft.Bench` is frozen
  * for the driver contract, so the health annotation lives here).
  *
  * Prints ONE JSON line: per query {min, reps[], pre_mbps, post_mbps}.
  * Never used for the driver metric — evidence for OPTIMIZATION_r06.md.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (8 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (128 << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Sequential write+read of 256 MB against tmpfs — MB/s. The round-5
      * host oscillated 14 MB/s–2.25 GB/s; this makes each entry's window
      * health part of the record. */
    def bwProbe(): Double = {
      val f = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get("/dev/shm"), "bwprobe_", ".bin")
      try {
        val buf = new Array[Byte](4 << 20)
        val t0 = System.nanoTime()
        val out = java.nio.file.Files.newOutputStream(f)
        try { var i = 0; while (i < 64) { out.write(buf); i += 1 } }
        finally out.close()
        val in = java.nio.file.Files.newInputStream(f)
        try { while (in.read(buf) > 0) () } finally in.close()
        (2.0 * 256) / ((System.nanoTime() - t0) / 1e9) // MB written+read / s
      } finally java.nio.file.Files.deleteIfExists(f)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm the index set; FAILURES ARE LOUD here (unlike the frozen Bench
    // warm-up): a failed warm build would silently poison every ft entry
    val warmErr: Option[String] =
      try { graft.ops.FullText.indexRoot(spark, sfDir); None }
      catch { case e: Throwable =>
        System.err.println(s"BenchExtra: index warm-up FAILED - ft numbers measure a cold/half-built cache: $e")
        Some(e.toString.take(200))
      }

    val headliners = Seq(
      "q1_agg", "q2_filter", "q4_join_multi", "q9_window", "q13_sessionize",
      "ft_bm25_topk", "ft_trigram_search", "ft_query_lang", "ft_query_or",
      "ft_query_paren", "ft_nears", "num_index_range", "ft_count_term",
      "ft_count_and", "ft_regex_search", "ft_query_not",
      "dedup_minhash_lsh", "dedup_simhash", "ann_cosine_topk",
      "text_quality")
    val entries = headliners.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val pre = bwProbe()
        spark.sparkContext.setJobDescription(s"benchx: $name")
        val reps = (1 to 3).map { _ =>
          time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        }
        spark.sparkContext.setJobDescription(null)
        val post = bwProbe()
        f""""$name":{"min":${reps.min}%.3f,"reps":[${reps.map(r => f"$r%.3f").mkString(",")}],"pre_mbps":$pre%.0f,"post_mbps":$post%.0f}"""
      }
    }
    val line = s"""{"benchx":{${entries.mkString(",")}},"sf":"$sfDir","warm_error":${warmErr.map("\"" + _ + "\"").getOrElse("null")}}"""
    println(line)
    sys.env.get("BENCHX_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
