package vfsidx.build

import vfsidx.SparkTestBase
import vfsidx.corpus.{Ingest, Synth}
import vfsidx.query.{Bm25Index, Oracle}

/** Incremental indexing (the reference's re-Regist story) and JSON/CSV
  * ingestion parity. */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = IndexBuild.BuildConfig(
    numBatches = 2, numBuckets = 4, saltThreshold = 150, shardSize = 128)

  test("ingest new docs + remerge == full rebuild over the union (rank-identical)") {
    val base = Synth.corpus(spark, 500, partitions = 4).cache()
    val extra = Synth.corpus(spark, 650, partitions = 4)
      .filter($"doc_id" >= 500).as[vfsidx.corpus.SourceFile].cache()
    val union = Synth.corpus(spark, 650, partitions = 4).cache()

    val dInc = tmpDir("inc_a")
    IndexBuild.build(spark, base, dInc, cfg)
    IndexBuild.ingestBatch(spark, extra, dInc, batchId = cfg.numBatches)
    IndexBuild.remerge(spark, dInc, cfg)

    val idx = new Bm25Index(spark, dInc)
    for (q <- Seq("index merge search", "the", "needle_600")) {
      val got = idx.topKOr(q, 10).as[(Long, Double)].collect().toSeq
      val want = Oracle.topKOr(spark, union, q, 10).as[(Long, Double)].collect().toSeq
      assert(got == want, s"query: $q")
    }
    // the new doc is findable
    assert(idx.topKOr("needle_600", 5).as[(Long, Double)].collect().map(_._1).toSeq == Seq(600L))
  }

  test("ingestBatch is idempotent (re-run skipped via _SUCCESS)") {
    val docs = Synth.corpus(spark, 100, partitions = 2).cache()
    val d = tmpDir("inc_b")
    IndexBuild.build(spark, docs, d, cfg.copy(numBatches = 1))
    val extra = Synth.corpus(spark, 120, partitions = 2)
      .filter($"doc_id" >= 100).as[vfsidx.corpus.SourceFile]
    IndexBuild.ingestBatch(spark, extra, d, 1)
    val lin1 = spark.read.parquet(IndexBuild.lineageDir(d)).count()
    IndexBuild.ingestBatch(spark, extra, d, 1)
    assert(spark.read.parquet(IndexBuild.lineageDir(d)).count() == lin1)
  }

  test("JSON-lines ingestion assigns dense deterministic doc_ids + sha256") {
    val dir = tmpDir("ingest_json")
    val rows = Seq(
      """{"id": 10435, "title": "t1", "content": "alpha beta gamma"}""",
      """{"id": 132763, "title": "t2", "content": "delta epsilon"}""",
      """{"id": 1, "title": "t3", "content": "alpha zeta"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/test.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    val corpus = Ingest.json(spark, dir, "content").collect().sortBy(_.doc_id)
    assert(corpus.map(_.doc_id).toSeq == Seq(0L, 1L, 2L))
    assert(corpus.map(_.content).toSet ==
      Set("alpha beta gamma", "delta epsilon", "alpha zeta"))
    corpus.foreach(c => assert(c.sha256 == Synth.sha256Hex(c.content)))
    // deterministic across re-reads
    val again = Ingest.json(spark, dir, "content").collect().sortBy(_.doc_id)
    assert(corpus.map(c => (c.doc_id, c.sha256)).toSeq ==
      again.map(c => (c.doc_id, c.sha256)).toSeq)
  }

  test("directory refresh indexes only NEW files and extends doc_ids (reference re-Regist)") {
    val data = tmpDir("refresh_data")
    val idx = tmpDir("refresh_idx")
    def writeFile(name: String, words: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$data/$name"),
        words.map(w => s"""{"content": "$w shared corpus"}""").mkString("\n").getBytes("UTF-8"))
    writeFile("a.json", Seq("alpha", "beta"))
    writeFile("b.json", Seq("gamma"))
    val (f1, d1) = Ingest.refreshJson(spark, idx, data, "content", cfg)
    assert(f1 == 2 && d1 == 3)
    // no new files -> no-op
    assert(Ingest.refreshJson(spark, idx, data, "content", cfg) == ((0, 0L)))
    // add a file -> only it is ingested; ids continue past the old corpus
    writeFile("c.json", Seq("delta", "epsilon"))
    val (f2, d2) = Ingest.refreshJson(spark, idx, data, "content", cfg)
    assert(f2 == 1 && d2 == 2)
    val ids = spark.read.parquet(IndexBuild.docStatsDir(idx))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 5L))
    // every doc findable through the merged index
    val idx2 = new Bm25Index(spark, idx)
    for ((w, expected) <- Seq("alpha" -> 1, "gamma" -> 1, "epsilon" -> 1, "shared" -> 5))
      assert(idx2.topKOr(w, 10).count() == expected, s"term $w")
  }

  test("LZ4-compressed JSON-lines ingest transparently (reference S3)") {
    // the reference decompresses .lz4 JSON before indexing
    // (/root/reference/util.go:174-212); Spark's text readers do the same
    // via the Hadoop codec inferred from the file extension.
    val dir = tmpDir("ingest_lz4")
    val codec = new org.apache.hadoop.io.compress.Lz4Codec()
    codec.setConf(spark.sparkContext.hadoopConfiguration)
    val out = codec.createOutputStream(
      new java.io.FileOutputStream(s"$dir/data.json.lz4"))
    val rows = (0 until 40).map(i => s"""{"content": "lzword$i alpha beta"}""")
    out.write(rows.mkString("\n").getBytes("UTF-8"))
    out.close()
    val corpus = Ingest.json(spark, dir, "content").collect().sortBy(_.doc_id)
    assert(corpus.length == 40)
    assert(corpus.map(_.content).toSet == (0 until 40).map(i => s"lzword$i alpha beta").toSet)
  }

  test("CSV directory refresh mirrors the JSON one") {
    val data = tmpDir("refresh_csv")
    val idx = tmpDir("refresh_csv_idx")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$data/a.csv"),
      "id,content\n1,alpha beta\n2,gamma beta\n".getBytes("UTF-8"))
    assert(Ingest.refreshCsv(spark, idx, data, "content", cfg) == ((1, 2L)))
    assert(Ingest.refreshCsv(spark, idx, data, "content", cfg) == ((0, 0L)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$data/b.csv"),
      "id,content\n3,delta beta\n".getBytes("UTF-8"))
    assert(Ingest.refreshCsv(spark, idx, data, "content", cfg) == ((1, 1L)))
    assert(new Bm25Index(spark, idx).topKOr("beta", 10).count() == 3)
  }

  test("CSV ingestion with header sniffing (reference S2)") {
    val dir = tmpDir("ingest_csv")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/test.1.csv"),
      "id,title,content\n1245676,top,\"alpha beta, quoted\"\n7,second,gamma\n".getBytes("UTF-8"))
    val corpus = Ingest.csv(spark, dir, "content").collect().sortBy(_.doc_id)
    assert(corpus.length == 2)
    assert(corpus.map(_.content).toSet == Set("alpha beta, quoted", "gamma"))
  }

  test("an ingested JSON corpus is end-to-end indexable and queryable") {
    val dir = tmpDir("ingest_e2e")
    val lines = (0 until 60).map(i =>
      s"""{"content": "term$i shared common word${i % 5}"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/data.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val corpus = Ingest.json(spark, dir, "content").cache()
    val idxDir = tmpDir("ingest_idx")
    IndexBuild.build(spark, corpus, idxDir, cfg.copy(numBatches = 1))
    val idx = new Bm25Index(spark, idxDir)
    val got = idx.topKOr("term7 shared", 5).as[(Long, Double)].collect().toSeq
    val want = Oracle.topKOr(spark, corpus, "term7 shared", 5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }
}
