package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators a training-data pipeline needs over a document
  * corpus: token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All are pure column expressions (whole-stage codegen, no
  * UDFs) and all have exact DuckDB oracles.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "data", "value")
  private val enMarkers = Seq("the", "fast", "slow", "small", "key")

  private def words: Column = split(col("text"), " ")

  /** Token counting: whitespace tokens + a regex token count (BPE-ish:
    * runs of alphanumerics or single punctuation). */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(
      $"doc_id",
      size(words).as("n_tokens"),
      length($"text").as("n_chars_real"),
      size(split($"text", "[^a-z0-9]+")).as("n_alnum_runs"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: stopword ratio, mean token length, char/token ratio.
    * Higher-order array functions — codegen'd, no UDF. */
  def quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nTokens = size(words).cast("double")
    val stopCnt = size(filter(words, w => w.isInCollection(stopwords))).cast("double")
    val sumLen = aggregate(words, lit(0), (acc, w) => acc + length(w)).cast("double")
    docs(s, dir).select(
      $"doc_id",
      round(stopCnt / nTokens, 6).as("stop_ratio"),
      round(sumLen / nTokens, 6).as("mean_tok_len"),
      round(length($"text").cast("double") / nTokens, 6).as("chars_per_tok"))
      .orderBy($"doc_id")
  }

  /** Language-ID heuristic: count of English marker words -> en/other.
    * (A deterministic n-gram-frequency heuristic; the corpus labels are
    * random so this demos the operator, not a trained model.) */
  def langGuess(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val markerCnt = size(filter(words, w => w.isInCollection(enMarkers)))
    docs(s, dir).select(
      $"doc_id",
      when(markerCnt >= 3, "en").otherwise("other").as("guess"),
      markerCnt.as("n_markers"),
      $"lang")
      .orderBy($"doc_id")
  }

  /** Document fingerprinting: md5 content hash + a 16-bucket shard key —
    * the exact-dedup / routing primitive. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(
      $"doc_id",
      md5($"text").as("fp"),
      substring(md5($"text"), 1, 1).as("bucket"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> (tokenCount _),
    "text_quality" -> (quality _),
    "text_lang_guess" -> (langGuess _),
    "text_fingerprint" -> (fingerprint _))

  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "text_token_count" ->
      """SELECT doc_id,
        |CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |CAST(length(text) AS INT) AS n_chars_real,
        |CAST(len(regexp_split_to_array(text, '[^a-z0-9]+')) AS INT) AS n_alnum_runs
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |round(len(list_filter(string_split(text,' '), w -> w IN (${sqlList(stopwords)}))) * 1.0
         |  / len(string_split(text,' ')), 6) AS stop_ratio,
         |round(list_sum(list_transform(string_split(text,' '), w -> length(w))) * 1.0
         |  / len(string_split(text,' ')), 6) AS mean_tok_len,
         |round(length(text) * 1.0 / len(string_split(text,' ')), 6) AS chars_per_tok
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lang_guess" ->
      s"""SELECT doc_id,
         |CASE WHEN len(list_filter(string_split(text,' '), w -> w IN (${sqlList(enMarkers)}))) >= 3
         |  THEN 'en' ELSE 'other' END AS guess,
         |CAST(len(list_filter(string_split(text,' '), w -> w IN (${sqlList(enMarkers)}))) AS INT) AS n_markers,
         |lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 1) AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin)
}
