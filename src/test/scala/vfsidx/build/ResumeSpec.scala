package vfsidx.build

import org.apache.spark.sql.functions.{hex, md5}
import vfsidx.SparkTestBase
import vfsidx.corpus.Synth

/** North_rule resumability: every build stage is checkpoint-resumable; a
  * partially-destroyed index rebuilds to an identical final state (the
  * reference's dirty-detection/atomic-rename invariant M2/M9 re-expressed,
  * /root/reference/record.go:46-82, /root/reference/filelist.go:224-231). */
class ResumeSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = IndexBuild.BuildConfig(
    numBatches = 4, numBuckets = 4, saltThreshold = 150, shardSize = 128)

  private def segmentsSorted(dir: String): Seq[(String, Int, Int, String)] =
    IndexBuild.readSegments(spark, dir)
      .select($"term", $"shard", $"count", md5(hex($"postings")).as("ph"))
      .as[(String, Int, Int, String)].collect().toSeq.sorted

  test("destroying segments + half the runs, then rebuilding, yields an identical index") {
    val docs = Synth.corpus(spark, 600, partitions = 4).cache()
    val d1 = tmpDir("resume_a")
    IndexBuild.build(spark, docs, d1, cfg)
    val expected = segmentsSorted(d1)
    assert(expected.nonEmpty)
    val lineageBefore = spark.read.parquet(IndexBuild.lineageDir(d1)).count()

    // simulate a mid-build crash: lose the merge output and two ingest batches
    def rmrf(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmrf(c.getPath))
      f.delete()
    }
    rmrf(s"$d1/segments")
    rmrf(IndexBuild.runsDir(d1, 1))
    rmrf(IndexBuild.runsDir(d1, 3))

    IndexBuild.build(spark, docs, d1, cfg)
    assert(segmentsSorted(d1) == expected, "rebuilt index differs from original")
    // lineage recorded the re-done work (append-only audit trail)
    val lineageAfter = spark.read.parquet(IndexBuild.lineageDir(d1)).count()
    assert(lineageAfter > lineageBefore)
  }

  test("rebuild over a complete index is a no-op (all stages skipped)") {
    val docs = Synth.corpus(spark, 300, partitions = 2).cache()
    val d = tmpDir("resume_b")
    IndexBuild.build(spark, docs, d, cfg)
    val lineage1 = spark.read.parquet(IndexBuild.lineageDir(d)).count()
    IndexBuild.build(spark, docs, d, cfg)
    val lineage2 = spark.read.parquet(IndexBuild.lineageDir(d)).count()
    assert(lineage1 == lineage2, "no-op rebuild must not add lineage rows")
  }

  test("lineage rows carry per-partition term ranges and posting counts") {
    val docs = Synth.corpus(spark, 300, partitions = 2).cache()
    val d = tmpDir("resume_c")
    IndexBuild.build(spark, docs, d, cfg)
    val lin = spark.read.parquet(IndexBuild.lineageDir(d))
      .as[LineageRow].collect()
    val stages = lin.map(_.stage).toSet
    assert(stages == Set("runs", "segments"))
    val segRows = lin.filter(_.stage == "segments")
    assert(segRows.forall(r => r.term_first <= r.term_last))
    assert(segRows.map(_.n_postings).sum ==
      IndexBuild.readSegments(spark, d)
        .agg(org.apache.spark.sql.functions.sum($"count")).as[Long].head())
  }
}
