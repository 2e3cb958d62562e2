package vfsidx.build

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import vfsidx.codec.VarByte
import vfsidx.corpus.SourceFile
import vfsidx.tokenize.Tokenizer

/** One (term, doc) posting emitted by tokenization. */
final case class Posting(term: String, doc_id: Long, tf: Int, dl: Int)

/** Final inverted-index segment row: one compressed posting list per
  * (term, shard). `shard` is 0 for tail terms; head terms (df above the salt
  * threshold) are split by doc_id range so no single reducer, parquet row, or
  * query task ever owns an unbounded Zipf-head posting list. Mirrors the
  * reference's merged `KeyRecord` segments with filename key ranges
  * (/root/reference/column.go:538-584, /root/reference/spec/index.fbs:22-29),
  * re-expressed as a columnar table with block-max skip metadata. */
final case class SegmentRow(
    bucket: Int,
    term: String,
    shard: Int,
    count: Int,
    postings: Array[Byte],
    block_first: Array[Long],
    block_last: Array[Long],
    block_off: Array[Int],
    block_max_norm: Array[Float])

final case class DictRow(term: String, df: Long, idf: Double)
final case class CorpusStats(n_docs: Long, avgdl: Double)

/** Per-partition lineage row (north_rule: "checkpoint-resumable with
  * per-partition lineage + metrics"). One row per completed unit of work:
  * ingest batch for the `runs` stage, shuffle bucket for the `segments`
  * stage. Resume = anti-join of planned units against these rows. */
final case class LineageRow(
    stage: String,
    partition_id: Int,
    term_first: String,
    term_last: String,
    doc_count: Long,
    n_postings: Long,
    bytes: Long,
    elapsed_ms: Long)

/** SPIMI-style inverted-index build, Spark-first.
  *
  * Reference lifecycle (SURVEY.md §3.1): tokenize -> per-(key,record) write
  * files -> background merge into sorted segments, resumable via
  * file-existence checks (/root/reference/column.go:139-235, record.go:46-82).
  * Spark restatement — each arrow is a Catalyst-planned stage, the single
  * `repartitionByRange` shuffle is the only data movement:
  *
  *   corpus --flatMap--> postings runs (per ingest batch, resumable)
  *   runs --groupBy(term)--> dictionary (df, idf)
  *   runs --repartitionByRange(term, shard) + sortWithinPartitions
  *        --mapPartitions encode--> segments (varbyte + block-max)
  *
  * Skew: terms whose df exceeds `saltThreshold` are sharded by
  * `doc_id / shardSize` *before* the range shuffle, so a term appearing in
  * 50% of 10^12 docs becomes ~df/shardSize bounded-size groups spread across
  * reducers instead of one hot key (north_rule salting requirement).
  *
  * Every stage writes plain Parquet in an Iceberg-compatible layout (one dir
  * per table); `_SUCCESS` markers + lineage rows drive resume. Swapping to
  * real Iceberg is `writeTo(...)` in [[TableIO]] (no jar in this sandbox —
  * SURVEY.md §7.0).
  */
object IndexBuild {

  val K1 = 1.2
  val B = 0.75

  final case class BuildConfig(
      numBatches: Int = 8,         // ingest-batch granularity (stage-1 resume unit)
      numBuckets: Int = 32,        // merge-shuffle partitions (stage-3 parallelism)
      saltThreshold: Long = 5000,  // df above this -> shard by doc range
      shardSize: Long = 4096,      // docs per head-term shard
      ingestParallelism: Int = 4)  // concurrent stage-1 batch jobs (reference M3 write pool)

  object TableIO {
    def write(df: DataFrame, dir: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(dir)
    def append(df: DataFrame, dir: String): Unit =
      df.write.mode(SaveMode.Append).parquet(dir)
    def done(spark: SparkSession, dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
  }

  def runsDir(dir: String, batch: Int) = s"$dir/runs/batch=$batch"
  def docStatsDir(dir: String) = s"$dir/doc_stats"
  def statsDir(dir: String) = s"$dir/stats"
  def dictDir(dir: String) = s"$dir/dictionary"
  def segmentsDir(dir: String) = s"$dir/segments"
  def lineageDir(dir: String) = s"$dir/lineage"

  def tokenize(docs: Dataset[SourceFile]): Dataset[Posting] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val (tfs, dl) = Tokenizer.termFreqs(d.content)
      import scala.jdk.CollectionConverters._
      tfs.entrySet().iterator().asScala.map(e => Posting(e.getKey, d.doc_id, e.getValue, dl))
    }
  }

  /** Full (or resumed) build. Idempotent: completed stages/batches are
    * detected via `_SUCCESS` markers and skipped, mirroring the reference's
    * dirty-detection resume (/root/reference/record.go:46-82). */
  private val verbose = sys.env.contains("GRAFT_BUILD_VERBOSE")
  @inline private def timed[A](name: String)(f: => A): A = {
    if (!verbose) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"BUILD-STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
  }

  def build(spark: SparkSession, docs: Dataset[SourceFile], dir: String,
            cfg: BuildConfig = BuildConfig()): Unit = {
    import spark.implicits._

    val nDocs = timed("count")(docs.count())
    val perBatch = math.max(1L, (nDocs + cfg.numBatches - 1) / cfg.numBatches)
    // lineage rows for work done by THIS invocation, flushed in one append
    // at the end (one tiny job instead of one per unit; resume keys off the
    // _SUCCESS markers, lineage is the audit/metrics trail)
    val lineage = scala.collection.mutable.ArrayBuffer[LineageRow]()

    // ---- stage 1: postings runs — a CONCURRENT pool of independent batch
    // jobs (the reference's write-pool M3, /root/reference/column.go:139-176
    // re-expressed as concurrent Spark job submission: batches touch
    // disjoint doc ranges and write disjoint dirs, so they only share
    // cluster slots; the scheduler interleaves their tasks and keeps the
    // executors saturated where sequential jobs would leave slots idle
    // between stages) ----
    val pending = (0 until cfg.numBatches).filter(b => !TableIO.done(spark, runsDir(dir, b)))
    if (pending.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(cfg.ingestParallelism, pending.size)))
      try {
        val futures = pending.map { b =>
          pool.submit(new java.util.concurrent.Callable[LineageRow] {
            def call(): LineageRow = timed(s"batch$b") {
              val rDir = runsDir(dir, b)
              val t0 = System.currentTimeMillis()
              val lo = b * perBatch
              val hi = math.min(nDocs, lo + perBatch)
              // column predicate (not a closure) so a parquet-backed corpus
              // gets min/max row-group pruning on doc_id
              val batchDocs = docs.filter($"doc_id" >= lo && $"doc_id" < hi).as[SourceFile]
              // no sort here: the merge stage re-ranges on (term, shard)
              // anyway, and parquet dictionary encoding compresses unsorted
              // terms fine
              val postings = tokenize(batchDocs)
              TableIO.write(postings.toDF(), rDir)
              // parquet-footer count: metadata only, no data scan
              val nPost = spark.read.parquet(rDir).count()
              LineageRow("runs", b, "", "", hi - lo, nPost, 0L,
                System.currentTimeMillis() - t0)
            }
          })
        }
        futures.foreach(f => lineage += f.get())
      } finally pool.shutdown()
    }

    val allRuns = spark.read.parquet((0 until cfg.numBatches).map(runsDir(dir, _)): _*).as[Posting]

    // ---- stage 2: doc fidelity table + dictionary + corpus stats ----
    // doc_stats is a columnar projection (doc_id, sha256): parquet never
    // reads `content`.
    if (!TableIO.done(spark, docStatsDir(dir))) timed("doc_stats") {
      TableIO.write(docs.select($"doc_id", $"sha256").toDF(), docStatsDir(dir))
    }
    buildDerived(spark, allRuns, nDocs, dir, cfg, lineage)

    if (lineage.nonEmpty) timed("lineage") {
      TableIO.append(spark.createDataset(lineage.toSeq).toDF(), lineageDir(dir))
    }
  }

  /** Stages 2b/3: dictionary + stats + segments from the postings runs.
    * Shared by the full [[build]] and incremental [[remerge]]. */
  private def buildDerived(spark: SparkSession, allRuns: Dataset[Posting],
                           nDocs: Long, dir: String, cfg: BuildConfig,
                           lineage: scala.collection.mutable.ArrayBuffer[LineageRow]): Unit = {
    import spark.implicits._
    if (!TableIO.done(spark, dictDir(dir))) timed("dict") {
      val n = nDocs.toDouble
      TableIO.write(
        allRuns.groupBy($"term").agg(count(lit(1)).as("df"), sum($"tf").as("tf_sum"))
          .select($"term", $"df", $"tf_sum",
            log((lit(n) - $"df" + 0.5) / ($"df" + 0.5) + 1.0).as("idf"))
          .toDF(), dictDir(dir))
    }
    // avgdl == sum(tf)/N because sum(dl over docs) == sum(tf over postings);
    // sum(tf) comes off the (small) dictionary, no extra pass over the runs.
    if (!TableIO.done(spark, statsDir(dir))) timed("stats") {
      val tfSum = spark.read.parquet(dictDir(dir)).agg(sum($"tf_sum")).as[Long].head()
      TableIO.write(Seq(CorpusStats(nDocs, tfSum.toDouble / nDocs)).toDF(), statsDir(dir))
    }
    val stats = spark.read.parquet(statsDir(dir)).as[CorpusStats].head()

    // ---- stage 3: the one global shuffle — salted range merge to segments ----
    if (!TableIO.done(spark, segmentsDir(dir))) timed("segments") {
      val t0 = System.currentTimeMillis()
      // The Zipf head is tiny by construction (#terms with df > threshold
      // < totalPostings/threshold), so it broadcast-joins; the tail never
      // touches the driver.
      val headDict = spark.read.parquet(dictDir(dir))
        .filter($"df" > cfg.saltThreshold)
        .select($"term", lit(true).as("is_head"))
      val shardSize = cfg.shardSize
      val avgdl = stats.avgdl

      val sharded = allRuns
        .join(broadcast(headDict), Seq("term"), "left")
        .withColumn("shard",
          when($"is_head", ($"doc_id" / shardSize).cast("int")).otherwise(lit(0)))
        .select($"term", $"doc_id", $"tf", $"dl", $"shard")
      // HASH partition on (term, shard) — not range: range partitioning needs
      // an extra sampling pass over every posting, and lexicographically
      // adjacent term families (e.g. 10^6 df=1 `needle_*` terms) all land in
      // one reducer. Hash spreads them uniformly; the per-file term min/max
      // stats that replace the reference's filename key ranges still come
      // from sortWithinPartitions below.
      val segs = sharded
        .repartition(cfg.numBuckets, $"term", $"shard")
        .sortWithinPartitions($"term", $"shard", $"doc_id")
        .as[(String, Long, Int, Int, Int)]
        .mapPartitions { it => encodePartition(it, avgdl) }
      TableIO.write(segs.toDF(), segmentsDir(dir))

      lineage ++= spark.read.parquet(segmentsDir(dir))
        .groupBy($"bucket")
        .agg(min($"term").as("tf_"), max($"term").as("tl_"),
          sum($"count").as("np"), sum(length($"postings")).as("bytes"))
        .as[(Int, String, String, Long, Long)]
        .collect()
        .map { case (pid, tf_, tl_, np, bytes) =>
          LineageRow("segments", pid, tf_, tl_, 0L, np, bytes,
            System.currentTimeMillis() - t0)
        }
    }
  }

  /** Incremental ingest (the reference's `Regist` refresh, M1/M2: re-running
    * registration picks up new data files and indexes only those,
    * /root/reference/indexer.go:77-93, /root/reference/column.go:167-176):
    * write one new postings-runs batch for `newDocs`, then [[remerge]] folds
    * every batch into fresh segments. Existing batches are untouched —
    * ingest is append-only and idempotent per batchId. */
  def ingestBatch(spark: SparkSession, newDocs: Dataset[SourceFile], dir: String,
                  batchId: Int): Unit = {
    import spark.implicits._
    val rDir = runsDir(dir, batchId)
    if (!TableIO.done(spark, rDir)) {
      val t0 = System.currentTimeMillis()
      TableIO.write(tokenize(newDocs).toDF(), rDir)
      val nPost = spark.read.parquet(rDir).count()
      TableIO.append(Seq(LineageRow("runs", batchId, "", "",
        newDocs.count(), nPost, 0L, System.currentTimeMillis() - t0)).toDF(),
        lineageDir(dir))
      TableIO.append(newDocs.select($"doc_id", $"sha256").toDF(), docStatsDir(dir))
    }
  }

  /** Recompute dictionary/stats/segments from ALL runs batches currently on
    * disk — the reference's merge/compaction consuming accumulated write
    * files (M4/M8, /root/reference/column.go:418-604). Invalidates and
    * rebuilds the derived tables; the runs (and the corpus) are the source
    * of truth. */
  def remerge(spark: SparkSession, dir: String, cfg: BuildConfig = BuildConfig()): Unit = {
    // All filesystem ops through Hadoop FileSystem (like TableIO.done), not
    // java.io.File — on HDFS/S3 a java.io rmrf is a silent no-op that would
    // leave stale segments readable after "invalidation".
    val hconf = spark.sparkContext.hadoopConfiguration
    def rmrf(p: String): Unit = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(hconf)
      if (fs.exists(path)) fs.delete(path, true)
    }
    Seq(dictDir(dir), statsDir(dir), segmentsDir(dir)).foreach(rmrf)
    val runsPath = new org.apache.hadoop.fs.Path(s"$dir/runs")
    val runsFs = runsPath.getFileSystem(hconf)
    val batches =
      (if (runsFs.exists(runsPath)) runsFs.listStatus(runsPath) else Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.getPath.getName.startsWith("batch="))
        .map(_.getPath.toString).sorted
    require(batches.nonEmpty, s"no runs batches under $dir/runs")
    import spark.implicits._
    val allRuns = spark.read.parquet(batches.toIndexedSeq: _*).as[Posting]
    val nDocs = spark.read.parquet(docStatsDir(dir)).count()
    val lineage = new scala.collection.mutable.ArrayBuffer[LineageRow]()
    buildDerived(spark, allRuns, nDocs, dir, cfg, lineage)
    if (lineage.nonEmpty) {
      import spark.implicits._
      TableIO.append(spark.createDataset(lineage.toSeq).toDF(), lineageDir(dir))
    }
  }

  /** Group a term+shard+doc_id-sorted partition stream into encoded segment
    * rows. Bounded memory: a group is at most `df` postings for tail terms
    * (df <= saltThreshold) or `shardSize` docs for head-term shards. */
  private def encodePartition(it: Iterator[(String, Long, Int, Int, Int)],
                              avgdl: Double): Iterator[SegmentRow] = {
    val bucket = org.apache.spark.TaskContext.getPartitionId()
    new Iterator[SegmentRow] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): SegmentRow = {
        val (term, _, _, _, shard) = buf.head
        val ids = Array.newBuilder[Long]
        val tfs = Array.newBuilder[Int]
        val dls = Array.newBuilder[Int]
        var n = 0
        while (buf.hasNext && buf.head._1 == term && buf.head._5 == shard) {
          val (_, d, tf, dl, _) = buf.next()
          ids += d; tfs += tf; dls += dl; n += 1
        }
        val enc = VarByte.encode(ids.result(), tfs.result(), dls.result(), avgdl, K1, B)
        SegmentRow(bucket, term, shard, n, enc.bytes,
          enc.blocks.map(_.firstDoc), enc.blocks.map(_.lastDoc),
          enc.blocks.map(_.offset), enc.blocks.map(_.maxNorm))
      }
    }
  }
}
