package vfsidx

import org.apache.spark.sql.SparkSession
import vfsidx.build.IndexBuild
import vfsidx.corpus.Synth
import vfsidx.query.Bm25Index

/** spark-submit entry point for the index engine (the reference's CLI
  * equivalent: `vfs-index index` / `vfs-index search`,
  * /root/reference/cmd/vfs-index/main.go:332-345,536-597).
  *
  * Usage:
  *   vfsidx.Main build <indexDir> [nDocs]          synthesize corpus + build index
  *   vfsidx.Main search <indexDir> <query...>      BM25 top-10 (OR)
  *   vfsidx.Main searchand <indexDir> <query...>   BM25 top-10 (AND intersection)
  *   vfsidx.Main query <parquetTable> <expr>       reference query language, e.g.
  *                                                 'title.search("x") && id == 3'
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("vfsidx")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = args.toList match {
    case "build" :: dir :: rest =>
      val n = rest.headOption.map(_.toLong).getOrElse(10000L)
      val t0 = System.nanoTime()
      val docs = Synth.corpus(spark, n)
      IndexBuild.build(spark, docs, dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val nSegs = spark.read.parquet(IndexBuild.segmentsDir(dir)).count()
      println(f"built index over $n docs in $secs%.1f s (${n / secs}%.0f docs/s), $nSegs segment rows -> $dir")
    case mode :: dir :: qparts if (mode == "search" || mode == "searchand") && qparts.nonEmpty =>
      val q = qparts.mkString(" ")
      val idx = new Bm25Index(spark, dir)
      val t0 = System.nanoTime()
      val hits = (if (mode == "search") idx.topKOr(q, 10) else idx.topKAnd(q, 10)).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"query [$q] (${mode.stripPrefix("search")}) -> ${hits.length} hits in $ms%.0f ms")
      hits.foreach(r => println(f"  doc=${r.getLong(0)}%-8d score=${r.getDouble(1)}%.6f"))
    case "indexjson" :: dir :: dataDir :: rest =>
      // the reference's `vfs-index index --data=<dir>` over JSON files
      val contentField = rest.headOption.getOrElse("content")
      val corpus = vfsidx.corpus.Ingest.json(spark, dataDir, contentField)
      val t0 = System.nanoTime()
      vfsidx.build.IndexBuild.build(spark, corpus, dir,
        vfsidx.build.IndexBuild.BuildConfig(numBatches = 1, numBuckets = 8))
      val n = spark.read.parquet(vfsidx.build.IndexBuild.docStatsDir(dir)).count()
      println(f"indexed $n docs from $dataDir in ${(System.nanoTime() - t0) / 1e9}%.1f s -> $dir")
    case "query" :: table :: exprParts if exprParts.nonEmpty =>
      val expr = exprParts.mkString(" ")
      val df = spark.read.parquet(table)
      val t0 = System.nanoTime()
      val rows = vfsidx.query.QueryParser.query(df, expr).limit(20).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"query [$expr] -> ${rows.length} rows in $ms%.0f ms")
      rows.foreach(r => println("  " + r.mkString(" | ").take(120)))
    case _ =>
      System.err.println("usage: build <dir> [nDocs] | search <dir> <query...> | searchand <dir> <query...> | query <table> <expr>")
      sys.exit(2)
  }
}
