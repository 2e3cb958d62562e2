package vfsidx.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import vfsidx.build.{NumericIndex, TrigramIndex}
import vfsidx.tokenize.Tokenizer

/** The reference's query language (PEG grammar /root/reference/expr/expr.peg:8-32,
  * IR `Qexpr{Ands: []Expr}` /root/reference/expr/qexpr.go:4-13): conjunctions
  * of `column OP value` and `column.search("str")`, e.g.
  *
  *   title.search("鬼滅の") && id == 3365460
  *
  * Re-expressed Spark-first: the parser compiles the expression to a Catalyst
  * `Column` predicate over any DataFrame with those columns. Semantics:
  *
  *  - `col.search("s")` / string equality -> substring containment. The
  *    reference implements this as trigram AND-intersection, which admits
  *    false positives; we apply the trigram test AND the exact containment
  *    recheck, i.e. true substring semantics (divergence documented in
  *    SURVEY.md §2.2; the indexed execution path with the same recheck is
  *    FullText.trigramSearch).
  *  - numeric comparisons `== != < <= > >=` -> strict/inclusive as written
  *    (the reference treats all four range ops inclusively — a bug we fix,
  *    /root/reference/search_cond.go:728-755).
  *  - `&&` conjunction only, matching the grammar (no OR — parity, §2.6).
  */
object QueryParser {

  sealed trait Expr
  final case class Search(col: String, s: String) extends Expr
  final case class Cmp(col: String, op: String, value: Either[Long, String]) extends Expr

  private val searchRe = """^\s*([A-Za-z_][A-Za-z0-9_]*)\.search\(\s*"((?:[^"\\]|\\.)*)"\s*\)\s*$""".r
  private val cmpRe = """^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(==|!=|<=|>=|<|>)\s*(?:"((?:[^"\\]|\\.)*)"|(-?\d+))\s*$""".r

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Split on top-level && (quotes respected). */
  private def splitAnds(q: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '"' && (i == 0 || q.charAt(i - 1) != '\\')) { inStr = !inStr; cur += c }
      else if (!inStr && c == '&' && i + 1 < q.length && q.charAt(i + 1) == '&') {
        parts += cur.toString; cur.clear(); i += 1
      } else cur += c
      i += 1
    }
    parts += cur.toString
    parts.result()
  }

  def parse(q: String): Seq[Expr] = splitAnds(q).map {
    case searchRe(col, s) => Search(col, unescape(s))
    case cmpRe(col, op, str, num) =>
      Cmp(col, op, if (str != null) Right(unescape(str)) else Left(num.toLong))
    case other => throw new IllegalArgumentException(s"cannot parse query term: '$other'")
  }

  /** Compile one expression to a Catalyst predicate. String search applies
    * the trigram containment test (the reference's index semantics) plus the
    * exact recheck. Short strings (<3 runes) produce zero trigram keys and
    * match nothing — the reference's silent-drop rule, pinned by
    * /root/reference/vfsindex_test.go:149-159. */
  def predicate(e: Expr): Column = e match {
    case Search(col, s) =>
      if (Tokenizer.triKeys(s).isEmpty) lit(false)
      else column(col).contains(s)
    case Cmp(col, op, Right(s)) =>
      if (op == "==") {
        if (Tokenizer.triKeys(s).isEmpty) lit(false) else column(col).contains(s)
      } else if (op == "!=") !column(col).contains(s)
      else throw new IllegalArgumentException(s"ordering comparison on string column: $op")
    case Cmp(col, op, Left(v)) => op match {
      case "==" => column(col) === v
      case "!=" => column(col) =!= v
      case "<"  => column(col) < v
      case "<=" => column(col) <= v
      case ">"  => column(col) > v
      case ">=" => column(col) >= v
    }
  }

  private def column(name: String): Column = col(name)

  /** Parse + apply: the reference's `SearchCond.Query(qstr)` as a DataFrame
    * transform (terminal verbs are plain Dataset actions: All = collect,
    * First = limit(1), Count = count — SURVEY.md §3.3). */
  def query(df: DataFrame, q: String): DataFrame =
    parse(q).map(predicate).foldLeft(df)((d, p) => d.filter(p))

  // ---- indexed execution -------------------------------------------------

  def triDir(root: String, col: String) = s"$root/tri/$col"

  /** Build the per-column index set consulted by [[queryIndexed]]:
    * a trigram index per string column, a sorted numeric projection per
    * numeric column — the reference's per-column `Regist` indexes
    * (/root/reference/indexer.go:77-93), one directory per column. */
  def buildIndexes(spark: SparkSession, df: DataFrame, idCol: String,
                   strCols: Seq[String], numCols: Seq[String], root: String,
                   triCfg: TrigramIndex.TriConfig = TrigramIndex.TriConfig()): Unit = {
    strCols.foreach(c => TrigramIndex.build(spark, df, idCol, c, triDir(root, c), triCfg))
    numCols.foreach(c => NumericIndex.build(spark, df, idCol, c, root))
  }

  /** Indexed execution of the reference query language — the dispatch the
    * reference performs in SearchCond.Query (/root/reference/search_cond.go:626-651
    * -> index_file.go:801-935): `col.search("s")` consults the column's
    * trigram index, numeric `==`/range predicates consult the numeric
    * secondary index, and anything un-indexed stays a scan predicate.
    *
    * Exactness by construction: the indexes only produce CANDIDATE doc_ids
    * (intersected across indexed conjuncts, then semi-joined to the table);
    * every parsed predicate — including the containment recheck — is
    * re-applied on the candidate rows, so the result is row-identical to
    * the brute-force [[query]] path (differential-tested in QueryParserSpec).
    * With no indexable conjunct this degrades to [[query]].
    */
  /** Numeric-index conjuncts matching more than this fraction of the table
    * are executed as scan predicates instead: a semi-join against 90% of the
    * row ids costs a full shuffle and saves nothing. Counting the pruned
    * index projection is cheap (row-group metadata + pruned scan), so the
    * gate is a real cost decision, not a guess. */
  val MaxIndexSelectivity = 0.25

  def queryIndexed(spark: SparkSession, df: DataFrame, idCol: String,
                   indexRoot: String, q: String): DataFrame = {
    val exprs = parse(q)
    lazy val tableRows = df.count()   // computed only if a numeric gate fires
    def selective(cand: DataFrame): Option[DataFrame] = {
      val n = cand.count()
      if (tableRows == 0 || n.toDouble / tableRows <= MaxIndexSelectivity) Some(cand)
      else None
    }
    val searchSets: Seq[DataFrame] = exprs.flatMap {
      case Search(c, s) if TrigramIndex.exists(spark, triDir(indexRoot, c)) &&
          Tokenizer.triKeys(s).nonEmpty =>
        Some(TrigramIndex.searchCandidates(spark, triDir(indexRoot, c), s))
      case _ => None
    }
    // Merge ALL numeric conjuncts on one column into a single index walk —
    // `x >= 300 && x < 600` is one pruned range scan, not two intersected
    // candidate sets (the reference's range lookup is likewise one
    // [first,last] walk, /root/reference/index_file.go:1208-1422).
    final case class Bounds(lo: Option[(Long, Boolean)], hi: Option[(Long, Boolean)],
                            eq: Option[Long], contradiction: Boolean)
    val numBounds = scala.collection.mutable.LinkedHashMap[String, Bounds]()
    exprs.foreach {
      case Cmp(c, op, Left(v)) if op != "!=" && NumericIndex.exists(spark, indexRoot, c) =>
        val b = numBounds.getOrElse(c, Bounds(None, None, None, contradiction = false))
        val nb = op match {
          case "==" => b.eq match {
            case Some(e) if e != v => b.copy(contradiction = true)
            case _ => b.copy(eq = Some(v))
          }
          case ">" | ">=" =>
            val cand = (v, op == ">=")
            val tighter = b.lo.forall { case (lv, lInc) => v > lv || (v == lv && !cand._2 && lInc) }
            if (tighter) b.copy(lo = Some(cand)) else b
          case "<" | "<=" =>
            val cand = (v, op == "<=")
            val tighter = b.hi.forall { case (hv, hInc) => v < hv || (v == hv && !cand._2 && hInc) }
            if (tighter) b.copy(hi = Some(cand)) else b
        }
        numBounds(c) = nb
      case _ => ()
    }
    val numSets: Seq[DataFrame] = numBounds.toSeq.flatMap { case (c, b) =>
      if (b.contradiction) Some(spark.range(0).toDF("doc_id"))
      else b.eq match {
        case Some(v) => selective(NumericIndex.point(spark, indexRoot, c, v))
        case None => selective(NumericIndex.range(spark, indexRoot, c,
          b.lo.map(_._1), b.hi.map(_._1),
          loInclusive = b.lo.forall(_._2), hiInclusive = b.hi.exists(_._2)))
      }
    }
    val candSets = searchSets ++ numSets
    val base =
      if (candSets.isEmpty) df
      else {
        val ids = candSets.reduce((a, b) => a.join(b, "doc_id"))
        df.join(ids.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi")
      }
    exprs.map(predicate).foldLeft(base)((d, p) => d.filter(p))
  }
}
