package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator (SURVEY.md §2 +
  * the training-data-pipeline ops); `oracleSql` carries the DuckDB
  * equivalent with IDENTICAL column aliases and rounding.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: BM25 top-10 over the
    * documents table (the engine's headline capability). */
  def entry(spark: SparkSession): DataFrame =
    ops.FullText.bm25TopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.FullText.queries ++
      ops.TextAnalysis.queries ++
      ops.Dedup.queries ++
      ops.Similarity.queries ++
      ops.Streaming.queries ++
      ops.Multimodal.queries

  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++
      ops.FullText.oracleSql ++
      ops.TextAnalysis.oracleSql ++
      ops.Dedup.oracleSql ++
      ops.Similarity.oracleSql ++
      ops.Streaming.oracleSql ++
      ops.Multimodal.oracleSql
}
