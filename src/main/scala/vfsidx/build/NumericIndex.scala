package vfsidx.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary point/range index for a numeric column on an UNSORTED table —
  * the reference's merged uint64-key segments with [first,last] file pruning
  * (/root/reference/index_file.go:937-1058,1208-1422), re-expressed
  * columnar: a (value, doc_id) projection range-partitioned and sorted by
  * value. Parquet row-group min/max statistics on `value` then play the
  * role of the reference's per-file key ranges — a point or range lookup
  * reads only the row groups whose [min,max] intersects the predicate
  * (`.explain` shows the pushed filter; PLANS.md carries the audit).
  *
  * At 100 TB the projection is a tiny fraction of the table (two int64
  * columns), the single `repartitionByRange` shuffle is the build cost, and
  * every lookup after that is a pruned scan of O(matching row groups) — no
  * full-table scan, no driver-side structure.
  */
object NumericIndex {

  import IndexBuild.TableIO

  def dir(root: String, col: String) = s"$root/num/$col"

  def exists(spark: SparkSession, root: String, column: String): Boolean =
    TableIO.done(spark, dir(root, column))

  def build(spark: SparkSession, df: DataFrame, idCol: String, numCol: String,
            root: String, numBuckets: Int = 32): Unit = {
    val out = dir(root, numCol)
    if (TableIO.done(spark, out)) return
    val proj = df.select(col(numCol).cast("long").as("value"),
        col(idCol).cast("long").as("doc_id"))
      .repartitionByRange(numBuckets, col("value"))
      .sortWithinPartitions(col("value"), col("doc_id"))
    TableIO.write(proj, out)
  }

  private def read(spark: SparkSession, root: String, column: String): DataFrame =
    spark.read.parquet(dir(root, column))

  /** doc_ids with value == v (reference P2 as an index lookup). */
  def point(spark: SparkSession, root: String, column: String, v: Long): DataFrame =
    read(spark, root, column).filter(col("value") === v).select(col("doc_id"))

  /** doc_ids with value in [lo, hi) / (lo, hi] etc. — strict/inclusive per
    * flag (reference P4; its all-inclusive bug consciously fixed, see
    * SURVEY.md §2.2). */
  def range(spark: SparkSession, root: String, column: String,
            lo: Option[Long], hi: Option[Long],
            loInclusive: Boolean = true, hiInclusive: Boolean = false): DataFrame = {
    var d = read(spark, root, column)
    lo.foreach(v => d = d.filter(if (loInclusive) col("value") >= v else col("value") > v))
    hi.foreach(v => d = d.filter(if (hiInclusive) col("value") <= v else col("value") < v))
    d.select(col("doc_id"))
  }
}
