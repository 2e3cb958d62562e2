package vfsidx.query

import org.apache.spark.sql.functions._
import vfsidx.SparkTestBase
import vfsidx.build.TrigramIndex

/** [[RegexTrigram.searchRegex]] must be row-identical to a full-scan
  * `rlike` filter for EVERY pattern — indexed patterns via a sound
  * (superset) prefilter + recheck, everything else via the scan fallback.
  * The plan() analysis itself is pinned on necessity: every clause it emits
  * must hold on every rlike match (property-checked below). */
class RegexTrigramSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows: Seq[(Long, String)] = {
    val rng = new scala.util.Random(4321)
    val words = Vector("index", "merge", "search", "batch", "the", "data",
      "query", "record", "val", "int", "return", "if", "x9", "quer")
    val base = (0L until 400L).map { i =>
      val n = 5 + rng.nextInt(20)
      (i, Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" "))
    }
    base ++ Seq(
      (400L, "鬼滅の刃 吾峠呼世晴による日本の漫画作品"),
      (401L, "line 42: val count = batch.merge(query)"),
      (402L, "emoji 😀 in the middle of the batch"),
      (403L, ""),
      (404L, "queries and querying the index merge path"),
      (405L, "a+b*c (escaped) [class] {brace}"),
      (406L, "the dataAbatch marker row"))
  }

  private lazy val df = rows.toDF("doc_id", "text").cache()

  private lazy val triDir = {
    val d = tmpDir("regexidx")
    TrigramIndex.build(spark, df, "doc_id", "text", d,
      TrigramIndex.TriConfig(numBuckets = 4, saltThreshold = 100, shardSize = 64))
    d
  }

  private def indexed(pattern: String): Seq[Long] =
    RegexTrigram.searchRegex(spark, triDir, df, "doc_id", "text", pattern)
      .select($"doc_id").as[Long].collect().sorted.toSeq

  private def scanned(pattern: String): Seq[Long] =
    df.filter($"text".rlike(pattern)).select($"doc_id").as[Long].collect().sorted.toSeq

  // patterns the analyzer should INDEX (literal clauses exist)
  private val indexablePatterns = Seq(
    "batch",                                   // plain literal
    "the (batch|merge)",                       // alternation of literals
    "quer(y|ies|ying)",                        // common prefix + suffix alt
    "(data|the) (batch|quer[a-z]+)",           // alt + opaque-tail branch
    "batch\\.merge\\(query\\)",                // escaped metachars
    "val [a-z]+ = batch",                      // opaque middle, literal ends
    "merge{1,2}",                              // bounded repetition unrolled
    "(index )+merge",                          // plus over a group
    "日本の(漫画|警察)",                        // non-ASCII literals
    "^line 42",                                // anchor + literal
    "batch.merge",                             // dot between literals
    "(the )?maybe_absent?",                    // finite set via optionals
    "😀 in",                                   // supplementary-plane literal
    "zzz_nowhere(a|b)",                        // indexable but zero matches
    "data[\\x41]batch",                        // in-class \xHH decodes to 'A'
    "[\\t ]the")                               // in-class \t + space literals

  // patterns that must FALL BACK to scan (no usable clause / unsupported)
  private val scanPatterns = Seq(
    ".*",                    // matches everything
    "[a-z]+",                // opaque class only
    "ab",                    // literal under the trigram floor
    "x9|batch",              // one branch under the floor voids the clause
    "a{0,3}",                // may match empty
    "(?i)batch",             // flag -> unsupported
    "(batch)\\1",            // backreference -> unsupported
    "\\d{4}-\\d{2}",         // digits only, no literal >= 3 chars survives
    "[\\u0064]ata",          // in-class \\u -> unsupported (not a literal 'u')
    "merge[a[bc]]",          // nested class -> unsupported
    "bat[a-z&&[^m]]h")       // class intersection -> unsupported

  test("indexed regex == full-scan rlike on indexable patterns") {
    for (p <- indexablePatterns)
      assert(indexed(p) == scanned(p), s"pattern '$p'")
  }

  test("fallback regex == full-scan rlike on unsupported/opaque patterns") {
    for (p <- scanPatterns)
      assert(indexed(p) == scanned(p), s"pattern '$p'")
  }

  test("plan() emits clauses only when indexable, and they are necessary") {
    // indexable: at least one clause, every member >= 3 code points
    for (p <- indexablePatterns) {
      val pl = RegexTrigram.plan(p)
      assert(pl.nonEmpty, s"expected a plan for '$p'")
      for (clause <- pl.get; m <- clause)
        assert(m.codePointCount(0, m.length) >= 3, s"'$p' member '$m'")
    }
    for (p <- Seq(".*", "[a-z]+", "ab", "x9|batch", "(?i)batch", "(batch)\\1",
        "[\\u0064]ata", "merge[a[bc]]", "bat[a-z&&[^m]]h"))
      assert(RegexTrigram.plan(p).isEmpty, s"expected scan fallback for '$p'")
    // the round-5 advisory's exact failure case: [\x41] must plan to {A},
    // never {x,4,1} — i.e. the clause set must admit 'dataAbatch'
    val fixed = RegexTrigram.plan("data[\\x41]batch")
    assert(fixed.nonEmpty)
    for (clause <- fixed.get)
      assert(clause.exists("dataAbatch".contains(_)),
        s"clause $clause would drop the true match 'dataAbatch'")
  }

  test("necessity property: every clause holds on every matching string") {
    // random strings from the corpus vocabulary; for each indexable pattern,
    // any string matched by the JAVA regex must satisfy every plan clause
    val rng = new scala.util.Random(7)
    val words = Vector("index", "merge", "batch", "the", "data", "query",
      "quer", "queries", "val", "line 42", "日本の漫画")
    val samples = (0 until 300).map { _ =>
      Seq.fill(1 + rng.nextInt(6))(words(rng.nextInt(words.size))).mkString(" ")
    }
    for (p <- indexablePatterns; pl <- RegexTrigram.plan(p)) {
      val re = java.util.regex.Pattern.compile(p)
      for (s <- samples if re.matcher(s).find()) {
        for (clause <- pl)
          assert(clause.exists(s.contains(_)),
            s"pattern '$p' matched '$s' but clause $clause violated")
      }
    }
  }

  test("pathological nesting stays bounded and correct") {
    // (a1|b1)(a2|b2)... would cross-product in CNF; caps must keep both the
    // analysis and the result correct (superset-or-scan either way)
    val p = "(index|merge)(batch|query)(the|data)(val|int)(return|if)(search|record)"
    assert(indexed(p) == scanned(p))
    // exponential alternation depth
    val deep = List.fill(12)("(a|b)").mkString
    assert(indexed(deep) == scanned(deep))
  }

  test("syntax errors propagate (same contract as rlike)") {
    intercept[java.util.regex.PatternSyntaxException] {
      RegexTrigram.searchRegex(spark, triDir, df, "doc_id", "text", "(unclosed")
    }
  }
}
