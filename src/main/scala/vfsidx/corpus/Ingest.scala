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

  /** Attach dense doc_id + sha256(content) to any (content-bearing) frame.
    * Typed Dataset transforms only (no RDD): both passes run over the same
    * deterministic file-scan plan, so partition ids line up. */
  def toCorpus(df: DataFrame, contentCol: String,
               repo: String = "ingest"): Dataset[SourceFile] = {
    val spark = df.sparkSession
    import spark.implicits._
    val contents = df.select(col(contentCol).cast("string")).as[String]
    val counts = contents.mapPartitions { it =>
      Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
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
}
