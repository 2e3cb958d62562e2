package vfsidx.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Build-time statistics for one numeric secondary index, persisted beside
  * the projection so the query planner NEVER runs a counting job:
  *  - `n_rows` answers "what fraction of the table would this candidate set
  *    be" (the projection has one row per table row);
  *  - `integral` records whether the source column was an exact integer
  *    type — fractional sources are cast (truncated toward zero) into the
  *    index, so range walks over them must widen strict bounds (see
  *    [[NumericIndex.range]]);
  *  - `quantiles` is a 129-point equi-probability sketch of `value`, the
  *    selectivity estimator standing in for the reference's per-file key
  *    ranges when deciding index-vs-scan.
  */
final case class NumStats(n_rows: Long, integral: Boolean, quantiles: Array[Double])

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

  def dir(root: String, col: String) = s"$root/num/$col/data"
  def statsDir(root: String, col: String) = s"$root/num/$col/stats"

  def exists(spark: SparkSession, root: String, column: String): Boolean =
    TableIO.done(spark, dir(root, column))

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  val QuantilePoints = 128

  def build(spark: SparkSession, df: DataFrame, idCol: String, numCol: String,
            root: String, numBuckets: Int = 32): Unit = {
    val out = dir(root, numCol)
    if (!TableIO.done(spark, out)) {
      val proj = df.select(col(numCol).cast("long").as("value"),
          col(idCol).cast("long").as("doc_id"))
        .repartitionByRange(numBuckets, col("value"))
        .sortWithinPartitions(col("value"), col("doc_id"))
      TableIO.write(proj, out)
    }
    if (!TableIO.done(spark, statsDir(root, numCol))) {
      import spark.implicits._
      val written = spark.read.parquet(out)
      val nRows = written.count()   // parquet-footer metadata, no data scan
      val probs = (0 to QuantilePoints).map(_.toDouble / QuantilePoints).toArray
      val qs =
        if (nRows == 0) Array.empty[Double]
        else written.stat.approxQuantile("value", probs, 0.001)
      TableIO.write(
        Seq(NumStats(nRows, isIntegral(df.schema(numCol).dataType), qs)).toDF(),
        statsDir(root, numCol))
    }
  }

  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, NumStats]()

  /** Persisted build stats; None while the stats table is absent (e.g. a
    * build crash-resumed between the data and stats commits). Only PRESENT
    * stats are cached — an absent table is re-probed on every call, so the
    * moment the resumed build commits it, the planner sees it. */
  def stats(spark: SparkSession, root: String, column: String): Option[NumStats] = {
    val d = statsDir(root, column)
    Option(statsCache.get(d)).orElse {
      import spark.implicits._
      if (!TableIO.done(spark, d)) None
      else {
        val st = spark.read.parquet(d).as[NumStats].head()
        statsCache.put(d, st)
        Some(st)
      }
    }
  }

  /** Estimated fraction of rows with value in the (index-walk, i.e. widened)
    * bounds, from the quantile sketch: the share of equi-probability cut
    * points strictly inside the interval, padded by one sketch step on each
    * side. An ESTIMATE — only used to decide index-vs-scan; exactness comes
    * from re-applying the predicates either way. */
  def estimateFraction(st: NumStats, lo: Option[Long], hi: Option[Long]): Double = {
    if (st.n_rows == 0 || st.quantiles.isEmpty) return 0.0
    val inside = st.quantiles.count(q =>
      lo.forall(q >= _.toDouble) && hi.forall(q <= _.toDouble))
    math.min(1.0, inside.toDouble / st.quantiles.length + 2.0 / st.quantiles.length)
  }

  private def read(spark: SparkSession, root: String, column: String): DataFrame =
    spark.read.parquet(dir(root, column))

  /** doc_ids with value == v (reference P2 as an index lookup). Exact even
    * for fractional sources: only x == v.0 truncates to v AND satisfies the
    * re-applied equality. */
  def point(spark: SparkSession, root: String, column: String, v: Long): DataFrame =
    read(spark, root, column).filter(col("value") === v).select(col("doc_id"))

  /** CANDIDATE doc_ids with value in [lo, hi) / (lo, hi] etc. —
    * strict/inclusive per flag (reference P4; its all-inclusive bug
    * consciously fixed, see SURVEY.md §2.2).
    *
    * For a NON-integral source column the stored value is cast("long")
    * (truncated toward zero), so strict bounds on the stored value would
    * silently drop boundary rows (x = 44.5 satisfies `x > 44` but its index
    * value 44 fails `value > 44`). The walk therefore widens strict bounds
    * to inclusive ones — for any real x and integer v, x > v implies
    * trunc(x) >= v and x < v implies trunc(x) <= v — and callers
    * (QueryParser.queryIndexed) re-apply the exact predicate on the
    * original column, restoring row-identical results. Integral sources
    * keep the exact strict walk. */
  def range(spark: SparkSession, root: String, column: String,
            lo: Option[Long], hi: Option[Long],
            loInclusive: Boolean = true, hiInclusive: Boolean = false): DataFrame = {
    // UNKNOWN integrality (stats table absent — e.g. mid-resume) must widen:
    // staying strict on a fractional source silently DROPS boundary rows,
    // while widening only admits candidates the re-applied predicate filters
    val integral = stats(spark, root, column).exists(_.integral)
    var d = read(spark, root, column)
    lo.foreach(v => d = d.filter(
      if (loInclusive || !integral) col("value") >= v else col("value") > v))
    hi.foreach(v => d = d.filter(
      if (hiInclusive || !integral) col("value") <= v else col("value") < v))
    d.select(col("doc_id"))
  }
}
