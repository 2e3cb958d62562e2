package vfsidx.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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
}
