package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata +
  * frame sampling, the pattern a 100 TB image/audio/video pipeline uses.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libraries in this container — see [[vfsidx.multimodal.BinaryDecode]] for
  * the real mapPartitions plumbing): payload bytes are synthesized as
  * `unhex(md5(text))` so both engines agree bit-for-bit, and "metadata
  * extraction" parses fake width/height from the first header bytes via
  * hex-digit arithmetic — exactly the shape a real header parse has.
  * The Spark side of the pattern (binary column, metadata struct, explode
  * of sampled frame indices, partition-friendly layout) is real and tested.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** hex digit pair -> 0..255 as a SQL expr both engines can compute. */
  private def hexByte(hcol: String, pos: Int): String =
    s"((instr('0123456789abcdef', substring($hcol, $pos, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substring($hcol, ${pos + 1}, 1)) - 1))"

  /** Fake-decode metadata from the synthetic payload, then sample frames:
    * one output row per (doc, frame_idx), frame stride from the header. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("h", md5($"text"))
      .withColumn("payload", unhex($"h"))                 // binary column (opaque blob)
      .withColumn("width", expr(hexByte("h", 1)).cast("int"))
      .withColumn("height", expr(hexByte("h", 3)).cast("int"))
      .withColumn("n_frames", (expr(hexByte("h", 5)).cast("int") % 4) + 1)
      .withColumn("payload_len", length($"payload").cast("int"))
      .select($"doc_id", $"width", $"height", $"payload_len",
        explode(sequence(lit(0), $"n_frames" - 1)).as("frame_idx"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Resize planning over the synthetic binary assets: decode header dims,
    * aspect-fit into a 64-square (integer math — the real logic of a resize
    * stage; pixel resampling is the stubbed part, see
    * [[vfsidx.multimodal.BinaryDecode.resize]] for the typed mapPartitions
    * twin tested in BinaryDecodeSpec). */
  val ResizeBox = 64
  def resizePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("h", md5($"text"))
      .withColumn("width", expr(hexByte("h", 1)).cast("int"))
      .withColumn("height", expr(hexByte("h", 3)).cast("int"))
      .withColumn("m", greatest($"width", $"height"))
      .withColumn("out_w",
        when($"m" <= ResizeBox, $"width")
          .otherwise(greatest(lit(1), expr(s"(width * $ResizeBox) div m"))).cast("int"))
      .withColumn("out_h",
        when($"m" <= ResizeBox, $"height")
          .otherwise(greatest(lit(1), expr(s"(height * $ResizeBox) div m"))).cast("int"))
      .select($"doc_id", $"width", $"height", $"out_w", $"out_h")
      .orderBy($"doc_id")
  }

  /** Feature extraction for frame 0 of each synthetic payload: the pooled
    * (mean) value of the 8-dim stub feature vector — byte i of the payload
    * scaled to [0,1] (the shape of a pooled embedding; see
    * [[vfsidx.multimodal.BinaryDecode.StubCodec.frameFeature]], whose typed
    * twin is tested in BinaryDecodeSpec). Hex-digit arithmetic only, so the
    * oracle reproduces it bit-for-bit. */
  val FeatureDim = 8
  def frameFeature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bytes = (0 until FeatureDim).map(i => expr(hexByte("h", 1 + 2 * i)))
    val mean = bytes.reduce(_ + _) / lit(255.0 * FeatureDim)
    docs(s, dir)
      .withColumn("h", md5($"text"))
      .select($"doc_id", lit(0).as("frame_idx"), round(mean, 6).as("feat_mean"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frame_sample" -> (frameSample _),
    "mm_resize" -> (resizePlan _),
    "mm_frame_feature" -> (frameFeature _))

  val oracleSql: Map[String, String] = Map(
    "mm_frame_sample" ->
      s"""WITH m AS (
         |  SELECT doc_id, md5(text) AS h, octet_length(unhex(md5(text))) AS payload_len
         |  FROM documents),
         |meta AS (
         |  SELECT doc_id,
         |    CAST(${hexByte("h", 1)} AS INT) AS width,
         |    CAST(${hexByte("h", 3)} AS INT) AS height,
         |    CAST(${hexByte("h", 5)} AS INT) % 4 + 1 AS n_frames,
         |    CAST(payload_len AS INT) AS payload_len
         |  FROM m)
         |SELECT doc_id, width, height, payload_len,
         |  CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_idx
         |FROM meta ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_frame_feature" -> {
      val bytes = (0 until FeatureDim).map(i => hexByte("md5(text)", 1 + 2 * i))
      s"""SELECT doc_id, CAST(0 AS INT) AS frame_idx,
         |  round((${bytes.mkString(" + ")}) / ${255.0 * FeatureDim}, 6) AS feat_mean
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "mm_resize" ->
      s"""WITH meta AS (
         |  SELECT doc_id,
         |    CAST(${hexByte("md5(text)", 1)} AS INT) AS width,
         |    CAST(${hexByte("md5(text)", 3)} AS INT) AS height
         |  FROM documents),
         |m2 AS (SELECT *, greatest(width, height) AS m FROM meta)
         |SELECT doc_id, width, height,
         |  CAST(CASE WHEN m <= $ResizeBox THEN width
         |       ELSE greatest(1, (width * $ResizeBox) // m) END AS INT) AS out_w,
         |  CAST(CASE WHEN m <= $ResizeBox THEN height
         |       ELSE greatest(1, (height * $ResizeBox) // m) END AS INT) AS out_h
         |FROM m2 ORDER BY doc_id""".stripMargin)
}
