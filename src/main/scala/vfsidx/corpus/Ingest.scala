package vfsidx.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion from the reference's source formats.
  *
  * The reference registers a *directory* of JSON / JSONL / CSV files
  * (S1/S2, /root/reference/util.go:174-212, /root/reference/indexer.go:217-248)
  * and identifies rows by (file inode, byte offset). Spark-first restatement:
  * `spark.read.json/csv` (which also handles compressed input transparently
  * — the reference's `.lz4` path, S3) plus a deterministic dense docID.
  *
  * docID assignment at 10^12-row scale cannot be a global sort or a driver
  * collect: we use the standard two-phase scheme — count rows per partition,
  * broadcast the per-partition offsets (one long per partition), then
  * docID = offset(partition) + local index. Deterministic for a fixed file
  * listing (Spark orders splits deterministically by file path/offset).
  */
object Ingest {

  /** Attach dense doc_id + sha256(content) to any (content-bearing) frame,
    * starting at `idOffset` (0 for a fresh corpus; the current doc count for
    * incremental refresh batches). Typed Dataset transforms only (no RDD):
    * both passes run over the same deterministic file-scan plan, so
    * partition ids line up. */
  def toCorpus(df: DataFrame, contentCol: String,
               repo: String = "ingest", idOffset: Long = 0L): Dataset[SourceFile] = {
    val spark = df.sparkSession
    import spark.implicits._
    val contents = df.select(col(contentCol).cast("string")).as[String]
    // Counting pass projects ZERO source columns: for columnar sources this
    // is row-group metadata only, for JSON/CSV it skips value decode — the
    // expensive content materialization happens once, in the id-assigning
    // pass below. File-split planning depends only on (files,
    // maxPartitionBytes), never on the projection, so partition ids line up
    // across the two plans.
    val counts = df.select(lit(1).as("one")).as[Int].mapPartitions { it =>
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(idOffset)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    contents.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val base = bc.value(pid)
      it.zipWithIndex.map { case (content0, j) =>
        val content = Option(content0).getOrElse("")
        SourceFile(base + j, repo, s"$repo/part=$pid/row=$j", "", "", content,
          Synth.sha256Hex(content))
      }
    }
  }

  /** JSON or JSONL directory/file (the reference's primary format, S1). */
  def json(spark: SparkSession, path: String, contentCol: String): Dataset[SourceFile] =
    toCorpus(spark.read.option("multiLine", "false").json(path), contentCol)

  /** CSV with header sniffing (reference S2, /root/reference/indexer.go:225-233). */
  def csv(spark: SparkSession, path: String, contentCol: String): Dataset[SourceFile] =
    toCorpus(spark.read.option("header", "true").csv(path), contentCol)

  // ---- incremental directory refresh (the reference's re-Regist, M1/M2) --

  def catalogDir(indexDir: String) = s"$indexDir/ingest_catalog"

  final case class CatalogRow(file_path: String, batch_id: Int,
                              n_docs: Long, doc_id_base: Long)

  /** Re-register a JSON/JSONL data directory against an index: list the
    * directory, diff against the ingest catalog, tokenize ONLY the new files
    * as a fresh postings batch (doc_ids continue after the existing corpus),
    * remerge, and record them — the reference's dirty-detection refresh
    * (`vfs-index index -data=<dir>` re-run, /root/reference/indexer.go:77-93,
    * /root/reference/column.go:167-176). Idempotent: no new files = no work.
    * Returns (newFiles, newDocs). */
  def refreshJson(spark: SparkSession, indexDir: String, dataDir: String,
                  contentCol: String,
                  cfg: vfsidx.build.IndexBuild.BuildConfig = vfsidx.build.IndexBuild.BuildConfig(numBatches = 1, numBuckets = 8)): (Int, Long) =
    refresh(spark, indexDir, dataDir, contentCol, "json", cfg)

  def refreshCsv(spark: SparkSession, indexDir: String, dataDir: String,
                 contentCol: String,
                 cfg: vfsidx.build.IndexBuild.BuildConfig = vfsidx.build.IndexBuild.BuildConfig(numBatches = 1, numBuckets = 8)): (Int, Long) =
    refresh(spark, indexDir, dataDir, contentCol, "csv", cfg)

  /** CONTINUOUS index maintenance (Structured Streaming over the ingest
    * directory): every micro-batch of new JSON files becomes one postings
    * batch sealed as its own immediately-queryable generation — the
    * streaming twin of [[refreshJson]], enabled by the log-structured
    * generation design (the reference's closest analog is re-running
    * `vfs-index index -data=<dir>` in a loop,
    * /root/reference/indexer.go:77-93).
    *
    * Mechanics: the file source tracks processed files in the checkpoint, so
    * restarts ingest only NEW files; each epoch is durably mapped to a
    * runs-batch slot (a per-epoch file under the checkpoint, committed
    * BEFORE ingesting), and [[vfsidx.build.IndexBuild.ingestBatch]] is
    * idempotent per slot (`_SUCCESS`-gated) — a redelivered epoch after a
    * crash re-reads its original slot and is skipped, never re-ingested as
    * duplicates. doc_ids continue densely from the persisted corpus size.
    * Auto-compaction bounds the generation count exactly as in the batch
    * refresh path; batch `indexjson` refreshes may alternate with stream
    * runs (slots are allocated off the shared runs listing) but must not
    * run CONCURRENTLY with an active stream.
    *
    * Runs with `Trigger.AvailableNow` for a bounded replay (tests/backfill);
    * drop the trigger for an unbounded production stream. */
  def streamJson(spark: SparkSession, indexDir: String, dataDir: String,
                 contentCol: String, checkpointDir: String,
                 cfg: vfsidx.build.IndexBuild.BuildConfig =
                   vfsidx.build.IndexBuild.BuildConfig(numBatches = 1, numBuckets = 8),
                 maxFilesPerTrigger: Int = 1,
                 schemaHint: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    import vfsidx.build.IndexBuild
    // Schema: caller-supplied, else the one persisted by a previous start,
    // else ONE batch inference — whose result is persisted under the
    // checkpoint so restarts never re-scan the (ever-growing) ingest
    // directory just to re-infer what is already known.
    val ckFs = new org.apache.hadoop.fs.Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schemaPath = new org.apache.hadoop.fs.Path(checkpointDir, "graft_schema.json")
    val schema: org.apache.spark.sql.types.StructType = schemaHint.getOrElse {
      if (ckFs.exists(schemaPath)) {
        val in = ckFs.open(schemaPath)
        val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      } else {
        val inferred = spark.read.option("multiLine", "false").json(dataDir).schema
        require(inferred.nonEmpty,
          s"cannot infer a schema from $dataDir (empty or no valid JSON yet); " +
            "pass schemaHint or start the stream after the first file lands")
        ckFs.mkdirs(new org.apache.hadoop.fs.Path(checkpointDir))
        val tmp = new org.apache.hadoop.fs.Path(checkpointDir, ".graft_schema.json.tmp")
        val out = ckFs.create(tmp, true)
        try out.write(inferred.json.getBytes("UTF-8")) finally out.close()
        require(ckFs.rename(tmp, schemaPath), s"rename $tmp -> $schemaPath failed")
        inferred
      }
    }
    // reclaim generations retired by earlier auto-compactions: by the next
    // stream start, any reader that planned against them is long gone
    IndexBuild.vacuum(spark, indexDir)
    // Durable epoch -> runs-slot map (one tiny file per epoch under the
    // checkpoint, written via temp+rename BEFORE ingesting): a REPLAYED
    // epoch — crash after foreachBatch, before the offset-log commit —
    // re-reads its original slot and the `_SUCCESS` gates skip the work,
    // instead of re-ingesting the same files into a fresh slot as duplicate
    // docs. A NEW epoch allocates max(existing runs batch)+1, so slots stay
    // monotone even if a batch `indexjson` refresh ran between stream runs.
    // (Do NOT run a batch refresh CONCURRENTLY with an active stream on the
    // same index — slot allocation is first-committed-wins, not locked.)
    val hfs = new org.apache.hadoop.fs.Path(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def slotFor(epochId: Long): Int = {
      val slotsDir = new org.apache.hadoop.fs.Path(checkpointDir, "graft_slots")
      val f = new org.apache.hadoop.fs.Path(slotsDir, s"epoch-$epochId")
      if (hfs.exists(f)) {
        val in = hfs.open(f)
        try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
      } else {
        val slot = IndexBuild.maxRunsBatch(spark, indexDir) + 1
        // RESERVE the slot in the index itself (create the runs batch dir)
        // before recording it in the checkpoint: maxRunsBatch-based
        // allocators (a later batch refresh, another stream start) then see
        // it and skip past, even if this epoch crashes before writing any
        // data — otherwise a refresh could claim the slot and the replayed
        // epoch would be _SUCCESS-skipped over the refresh's data, silently
        // dropping this epoch's files.
        val resFs = new org.apache.hadoop.fs.Path(IndexBuild.runsDir(indexDir, slot))
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        resFs.mkdirs(new org.apache.hadoop.fs.Path(IndexBuild.runsDir(indexDir, slot)))
        hfs.mkdirs(slotsDir)
        val tmp = new org.apache.hadoop.fs.Path(slotsDir, s".epoch-$epochId.tmp")
        val out = hfs.create(tmp, true)
        try out.write(slot.toString.getBytes("UTF-8")) finally out.close()
        require(hfs.rename(tmp, f), s"rename $tmp -> $f failed")
        slot
      }
    }
    val stream = spark.readStream.schema(schema)
      .option("multiLine", "false")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dataDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, epochId: Long) =>
        // an empty epoch allocates no slot — safe: slot allocation stays
        // monotone and compaction reads only existing batches
        if (df.isEmpty) ()
        else {
        // reclaim generations retired by PREVIOUS epochs' compactions —
        // one epoch is the in-stream grace period, so an unbounded stream
        // never accumulates retired dirs
        IndexBuild.vacuum(spark, indexDir)
        val slot = slotFor(epochId)
        // ids continue after the persisted corpus. docCount reads only
        // COMMITTED doc_stats partitions, and ingestBatch commits runs
        // BEFORE the batch's doc_stats: a replayed epoch whose runs did
        // not commit re-derives the SAME base (its doc_stats cannot have
        // committed either), and one whose runs committed is skipped by
        // the _SUCCESS gates before ids matter.
        val base = IndexBuild.docCount(spark, indexDir)
        val corpus = toCorpus(df, contentCol,
          repo = s"stream/batch=$slot", idOffset = base).cache()
        try {
          IndexBuild.ingestBatch(spark, corpus, indexDir, slot, cfg)
          // size-tiered auto-fold: bounded work (one small window), never
          // spans a reserved slot, reclaim deferred to a later vacuum
          IndexBuild.compactTiered(spark, indexDir, cfg, reclaim = false)
          ()
        } finally corpus.unpersist()
        }
      }
      .start()
    q.awaitTermination()
  }

  private def refresh(spark: SparkSession, indexDir: String, dataDir: String,
                      contentCol: String, format: String,
                      cfg: vfsidx.build.IndexBuild.BuildConfig): (Int, Long) = {
    import spark.implicits._
    import vfsidx.build.IndexBuild
    val exts = format match {
      case "json" => Seq(".json", ".jsonl", ".ndjson", ".json.lz4")
      case "csv"  => Seq(".csv", ".tsv", ".csv.lz4")
      case other  => throw new IllegalArgumentException(s"unsupported refresh format: $other")
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    val dataPath = new org.apache.hadoop.fs.Path(dataDir)
    val fs = dataPath.getFileSystem(hconf)
    val files = fs.listStatus(dataPath)
      .filter(_.isFile)
      .map(_.getPath.toString)
      .filter(p => exts.exists(p.endsWith))
      .sorted
    val catPath = new org.apache.hadoop.fs.Path(catalogDir(indexDir))
    val catFs = catPath.getFileSystem(hconf)
    // reclaim generations retired by the PREVIOUS refresh's compaction -
    // one full refresh cycle is the grace period for in-flight readers
    if (catFs.exists(catPath)) IndexBuild.vacuum(spark, indexDir)

    // ---- refresh intent WAL ------------------------------------------
    // (slot, doc base, file list) is persisted BEFORE ingesting, cleared
    // after the catalog append: a crash anywhere between leaves an intent
    // whose recovery below re-derives the SAME slot and base, so the
    // _SUCCESS gates make the re-run exactly-once instead of re-ingesting
    // the same files into a fresh slot as duplicate docs.
    val intentP = new org.apache.hadoop.fs.Path(s"$indexDir/refresh_intent")
    /** None = no intent. A truncated/unparseable intent (which writeIntent's
      * temp+rename protocol can never produce, but a hand-edited or
      * foreign-version file could) parses to an EMPTY file list — recovery
      * then just clears it instead of wedging every future refresh. */
    def readIntent(): Option[(Int, Long, Seq[String])] =
      if (!catFs.exists(intentP)) None
      else {
        val in = catFs.open(intentP)
        val lines =
          try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq
          finally in.close()
        scala.util.Try(
          (lines.head.trim.toInt, lines(1).trim.toLong, lines.drop(2).filter(_.nonEmpty))
        ).toOption.orElse(Some((0, 0L, Seq.empty[String])))
      }
    def writeIntent(slot: Int, base: Long, fls: Seq[String]): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/.refresh_intent.tmp")
      val out = catFs.create(tmp, true)
      try out.write((s"$slot\n$base\n" + fls.mkString("\n")).getBytes("UTF-8"))
      finally out.close()
      if (catFs.exists(intentP)) catFs.delete(intentP, false)
      require(catFs.rename(tmp, intentP), s"rename $tmp -> $intentP failed")
    }
    def clearIntent(): Unit =
      if (catFs.exists(intentP)) catFs.delete(intentP, false)

    /** Ingest one file batch at a fixed (slot, base) and record it in the
      * catalog; idempotent given the same (slot, base, files). */
    def ingestFiles(slot: Int, base: Long, fls: Seq[String], initial: Boolean): Long = {
      val raw = format match {
        case "json" => spark.read.option("multiLine", "false").json(fls.toIndexedSeq: _*)
        case _      => spark.read.option("header", "true").csv(fls.toIndexedSeq: _*)
      }
      val corpus = toCorpus(raw,
        contentCol, repo = s"refresh/batch=$slot", idOffset = base).cache()
      val nNew = corpus.count()
      if (initial) IndexBuild.build(spark, corpus, indexDir, cfg.copy(numBatches = 1))
      else {
        // O(new data): the batch seals its own queryable generation - no
        // remerge. Compaction only fires on accumulation; reclaim is
        // deferred to the NEXT refresh's vacuum so concurrent readers
        // keep their files.
        IndexBuild.ingestBatch(spark, corpus, indexDir, slot, cfg)
        IndexBuild.compactTiered(spark, indexDir, cfg, reclaim = false)
      }
      // one catalog row per file would need per-file counts; the refresh
      // unit is the batch, so record the batch's files with batch totals
      IndexBuild.TableIO.append(
        fls.map(f => CatalogRow(f, slot, nNew, base)).toSeq.toDF(),
        catalogDir(indexDir))
      corpus.unpersist()
      nNew
    }

    // ---- recovery: finish a crashed refresh before planning a new one ----
    readIntent().foreach { case (slot, base, fls) =>
      if (fls.nonEmpty) {
        val recorded = catFs.exists(catPath) &&
          spark.read.parquet(catalogDir(indexDir))
            .filter($"file_path" === fls.head).limit(1).count() > 0
        if (!recorded)
          ingestFiles(slot, base, fls, initial = slot == 0 && !catFs.exists(catPath))
      }
      // an empty file list is a stale/foreign intent: clear, don't wedge
      clearIntent()
    }

    val catEmpty = !catFs.exists(catPath)
    // Diff listed files against the catalog as an ANTI-JOIN, never
    // collecting the catalog to the driver (at 10^7 ingested files the
    // catalog is a table, not a driver object). Only the NEW paths - the
    // refresh unit - come back.
    val newFiles: Seq[String] =
      if (catEmpty) files.toSeq
      else {
        val cat = spark.read.parquet(catalogDir(indexDir))
        files.toSeq.toDF("file_path")
          .join(cat.select($"file_path"), Seq("file_path"), "left_anti")
          .as[String].collect().toSeq.sorted
      }
    if (newFiles.isEmpty) return (0, 0L)
    // Batch slot and doc_id base come from the INDEX, not the catalog: a
    // streaming ingest (streamJson) occupies runs slots and doc_ids the
    // catalog never sees - deriving either from catalog sums would collide
    // with them (slot collision = new files silently recorded as indexed
    // without ever being tokenized). docCount reads only COMMITTED
    // doc_stats partitions, so a crashed write cannot shift the base.
    val batchId: Int =
      if (catEmpty) 0
      else {
        val maxBatch = spark.read.parquet(catalogDir(indexDir))
          .agg(max($"batch_id")).as[Int].head()
        math.max(maxBatch + 1, IndexBuild.maxRunsBatch(spark, indexDir) + 1)
      }
    val docBase = IndexBuild.docCount(spark, indexDir)
    // Guard against a catalog/index mismatch: an empty catalog (and no
    // intent - recovery ran above) means THIS is the initial build, which
    // will occupy runs/batch=0 - if that batch already exists (a prior
    // `build`/pre-catalog `indexjson` run), silently skipping it via
    // _SUCCESS would record the new files as indexed without ever
    // tokenizing them, with wrong doc_id bases for every later refresh.
    if (catEmpty && IndexBuild.TableIO.done(spark, IndexBuild.runsDir(indexDir, 0)))
      throw new IllegalStateException(
        s"$indexDir already contains runs/batch=0 but has no ingest catalog: " +
          "it was built outside the refresh flow. Refresh into a fresh index " +
          "directory (or keep using the original build path).")
    writeIntent(batchId, docBase, newFiles)
    val nNew = ingestFiles(batchId, docBase, newFiles, initial = catEmpty)
    clearIntent()
    (newFiles.length, nNew)
  }
}
