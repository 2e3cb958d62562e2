package vfsidx.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable source-format seam for the ingest paths — the reference's
  * per-extension decoder registry (`Decoder{FileType, Encoder, Decoder,
  * Tokenizer}` looked up by filename suffix, /root/reference/util.go:93-98,
  * GetDecoder /root/reference/util.go:240-255). A new on-disk format becomes
  * a [[ContentDecoder.register]] call instead of an engine edit:
  * `Ingest.refresh`/`Ingest.stream` resolve the format name here for both
  * the directory-listing extension filter and the actual reads.
  *
  * Implementations must be cheap to construct and stateless: one instance
  * serves every refresh and stream epoch. Rows must come back in file byte
  * order within each file (every Spark file source does this) — doc-id
  * assignment depends on it (see [[Ingest.withDocIds]]).
  */
trait ContentDecoder {
  /** Format key used by `refresh`/`stream` callers (e.g. "json"). */
  def name: String

  /** Filename suffixes this format claims when listing a data directory
    * (include compressed variants — Spark decompresses by suffix). */
  def extensions: Seq[String]

  /** Batch-read the given files (refresh path). */
  def read(spark: SparkSession, files: Seq[String]): DataFrame

  /** One-off schema inference over a data directory (stream start; the
    * result is persisted under the checkpoint and never re-inferred). */
  def inferSchema(spark: SparkSession, dir: String): StructType

  /** Streaming read of a data directory with a fixed schema (stream path). */
  def readStream(spark: SparkSession, schema: StructType, dir: String,
                 maxFilesPerTrigger: Int): DataFrame
}

object ContentDecoder {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ContentDecoder]()

  /** Register (or replace) a decoder under its [[ContentDecoder.name]]. */
  def register(d: ContentDecoder): Unit = registry.put(d.name, d)

  /** Resolve a format name; loud about what IS registered on a miss. */
  def forFormat(format: String): ContentDecoder = {
    val d = registry.get(format)
    if (d == null) {
      import scala.jdk.CollectionConverters._
      throw new IllegalArgumentException(
        s"no ContentDecoder registered for format '$format' " +
          s"(registered: ${registry.keySet().asScala.toSeq.sorted.mkString(", ")}); " +
          "add one with ContentDecoder.register")
    }
    d
  }

  /** JSON-lines (the reference's primary format, S1) — also transparently
    * LZ4-compressed files (S3, by suffix). */
  object JsonLines extends ContentDecoder {
    val name = "json"
    val extensions = Seq(".json", ".jsonl", ".ndjson", ".json.lz4")
    def read(spark: SparkSession, files: Seq[String]): DataFrame =
      spark.read.option("multiLine", "false").json(files.toIndexedSeq: _*)
    def inferSchema(spark: SparkSession, dir: String): StructType =
      spark.read.option("multiLine", "false").json(dir).schema
    def readStream(spark: SparkSession, schema: StructType, dir: String,
                   maxFilesPerTrigger: Int): DataFrame =
      spark.readStream.schema(schema)
        .option("multiLine", "false")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .json(dir)
  }

  /** CSV with header sniffing (S2, /root/reference/indexer.go:225-233). */
  object Csv extends ContentDecoder {
    val name = "csv"
    val extensions = Seq(".csv", ".tsv", ".csv.lz4")
    def read(spark: SparkSession, files: Seq[String]): DataFrame =
      spark.read.option("header", "true").csv(files.toIndexedSeq: _*)
    def inferSchema(spark: SparkSession, dir: String): StructType =
      spark.read.option("header", "true").csv(dir).schema
    def readStream(spark: SparkSession, schema: StructType, dir: String,
                   maxFilesPerTrigger: Int): DataFrame =
      spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .csv(dir)
  }

  register(JsonLines)
  register(Csv)
}
