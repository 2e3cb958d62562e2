package vfsidx.query

import vfsidx.SparkTestBase

/** Pins the reference query-language semantics (grammar
  * /root/reference/expr/expr.peg:8-32, parser tests
  * /root/reference/expr/qexpr_test.go:10-77) against a corpus shaped like
  * the reference's 31-row Japanese fixture. */
class QueryParserSpec extends SparkTestBase {
  import spark.implicits._
  import QueryParser._

  private lazy val df = Seq(
    (132763L, "鬼滅の刃", "吾峠呼世晴による日本の漫画作品"),
    (3365460L, "警視庁", "日本の警察組織のひとつ"),
    (10435L, "桶狭間の戦い", "戦国時代の合戦"),
    (1L, "ab", "short")
  ).toDF("id", "title", "content")

  test("parses the reference's example AND query") {
    val es = parse("""title.search("鬼滅の") && id == 132763""")
    assert(es == Seq(Search("title", "鬼滅の"), Cmp("id", "==", Left(132763L))))
  }

  test("string equality == means substring containment (reference P3)") {
    val r = query(df, """title == "警視庁"""").select($"id").as[Long].collect()
    assert(r.toSeq == Seq(3365460L))
  }

  test("search + numeric eq conjunction") {
    val r = query(df, """title.search("鬼滅の") && id == 132763""")
      .select($"id").as[Long].collect()
    assert(r.toSeq == Seq(132763L))
    val none = query(df, """title.search("鬼滅の") && id == 999""").count()
    assert(none == 0)
  }

  test("queries shorter than 3 runes match nothing (reference drop rule)") {
    assert(query(df, """title.search("ab")""").count() == 0)
    assert(query(df, """title == "の"""").count() == 0)
  }

  test("numeric range ops are strict/inclusive as written (reference bug fixed)") {
    assert(query(df, "id > 132763").count() == 1)   // only 3365460
    assert(query(df, "id >= 132763").count() == 2)
    assert(query(df, "id < 10435").count() == 1)    // only 1
    assert(query(df, "id <= 10435").count() == 2)
  }

  test("parse errors are loud") {
    intercept[IllegalArgumentException](parse("title ~~ 3"))
  }

  test("regex atom parses, matches unanchored, and rejects bad patterns loudly") {
    assert(parse("""title.regex("鬼滅|警視")""") == Seq(Regex("title", "鬼滅|警視")))
    val r = query(df, """content.regex("日本の(漫画|警察)")""")
      .select($"id").as[Long].collect().sorted
    assert(r.toSeq == Seq(132763L, 3365460L))
    // '|' inside the quoted pattern must not split the expression
    val or = query(df, """content.regex("漫画|合戦") && id > 100""")
      .select($"id").as[Long].collect().sorted
    assert(or.toSeq == Seq(10435L, 132763L))
    intercept[IllegalArgumentException](parse("""title.regex("(unclosed")"""))
  }

  test("negation: De Morgan push-down, double negation, 3VL, short-needle inversion") {
    // atom-level
    assert(parse("""!title.search("鬼滅の")""") == Seq(Not(Search("title", "鬼滅の"))))
    assert(parse("""!!title.search("鬼滅の")""") == Seq(Search("title", "鬼滅の")))
    // De Morgan over a group: !(a || b) = !a && !b (one conjunct group)
    assert(parseQuery("""!(id == 1 || id == 2)""") ==
      Seq(Seq(Not(Cmp("id", "==", Left(1L))), Not(Cmp("id", "==", Left(2L))))))
    // !(a && b) = !a || !b (two groups)
    assert(parseQuery("""!(id == 1 && title.search("鬼滅の"))""") ==
      Seq(Seq(Not(Cmp("id", "==", Left(1L)))),
          Seq(Not(Search("title", "鬼滅の")))))
    // rows: negation composes with conjuncts
    val r = query(df, """content.search("日本の") && !title.search("警視庁")""")
      .select($"id").as[Long].collect().sorted
    assert(r.toSeq == Seq(132763L))
    // a negated sub-3-rune search is literally TRUE (positive form matches
    // nothing by the reference drop rule), so every row passes
    assert(query(df, """!title.search("ab")""").count() == df.count())
    // precedence: ! binds tighter than && — !a && b, not !(a && b)
    val p = query(df, """!content.search("警察組織") && id > 100""")
      .select($"id").as[Long].collect().sorted
    assert(p.toSeq == Seq(10435L, 132763L))
    // pathological: negating an OR of 4-conjunct groups cross-products to
    // 4^4 = 256 groups — negate()'s own cap must fire loudly (the inner
    // parse is only 4 groups, well under the bound)
    val wide = (1 to 4).map(g =>
      (1 to 4).map(a => s"id == ${g * 10 + a}").mkString(" && ")).mkString(" || ")
    assert(parseQuery(wide).size == 4)
    intercept[IllegalArgumentException](parseQuery(s"!($wide)"))
  }

  test("string ordering comparisons are lexicographic scan predicates") {
    // reference StringOp accepts <,<=,>,>= on strings
    // (/root/reference/search_cond.go:793-822) ordering by trigram KEY; we
    // take SQL lexicographic semantics (documented divergence)
    val r = query(df, """content >= "戦" && content < "斬"""")
      .select($"id").as[Long].collect()
    assert(r.toSeq == Seq(10435L))   // only 戦国時代の合戦
    assert(query(df, """content >= "a" && content <= "z"""").count() == 1) // "short"
    assert(query(df, """title > "警視庁"""").count() ==
      df.filter($"title" > "警視庁").count())
  }

  test("parenthesized groups compose and normalize to DNF") {
    // a && (b || c) distributes: two conjunct groups sharing `a`
    assert(parseQuery("""title.search("戦") && (id < 100 || id > 100000)""") ==
      Seq(Seq(Search("title", "戦"), Cmp("id", "<", Left(100L))),
        Seq(Search("title", "戦"), Cmp("id", ">", Left(100000L)))))
    val r = query(df, """content.search("日本の") && (id == 132763 || id == 3365460)""")
      .select($"id").as[Long].collect().sorted
    assert(r.toSeq == Seq(132763L, 3365460L))
    // nesting
    assert(query(df, """(id > 0 && (id < 10 || id > 3000000))""").count() == 2)
    // (a || b) && (c || d) -> 4 groups
    assert(parseQuery("(id == 1 || id == 2) && (id == 3 || id == 4)").size == 4)
    // parens inside quoted strings and the .search(...) call are atom text
    assert(parse("""title == "(x||y)"""") == Seq(Cmp("title", "==", Right("(x||y)"))))
    // unbalanced parens are loud
    intercept[IllegalArgumentException](parseQuery("(id > 1 && id < 5"))
    intercept[IllegalArgumentException](parseQuery("id > 1) && id < 5"))
  }

  test("pathological DNF blowup is a loud bound error, not a driver OOM") {
    // (a||b) && (a||b) && ... doubles the group count per factor: 2^n.
    // 6 factors = 64 groups = exactly the bound; 7 = 128 must refuse.
    def nested(n: Int): String =
      Seq.fill(n)("(id == 1 || id == 2)").mkString(" && ")
    assert(QueryParser.parseQuery(nested(6)).size == 64)
    val e = intercept[IllegalArgumentException](QueryParser.parseQuery(nested(7)))
    assert(e.getMessage.contains("||-groups"))
    // the refusal happens during PARSING — group count never materializes
    // past the first over-bound intermediate (128 here), so even a 30-factor
    // (2^30 groups) expression fails instantly instead of allocating
    val e2 = intercept[IllegalArgumentException](QueryParser.parseQuery(nested(30)))
    assert(e2.getMessage.contains("restructure"))
  }

  test("top-level || is an OR of conjunct groups (&& binds tighter)") {
    val r = query(df, """title.search("鬼滅の") && id == 132763 || id < 10000""")
      .select($"id").as[Long].collect().sorted
    assert(r.toSeq == Seq(1L, 132763L))
    // quoted || is not a split point
    assert(parse("""title == "a||b"""") == Seq(Cmp("title", "==", Right("a||b"))))
    // parse() (pure-conjunction callers) rejects ||
    intercept[IllegalArgumentException](parse("id > 1 || id < 0"))
  }
}
