package graft

import vfsidx.SparkTestBase

/** Driver-contract smoke: entry() returns rows; every `queries` entry runs
  * at sf0.001 and every oracled query has matching column names (the
  * driver's compare sorts columns by name before hashing — a name mismatch
  * fails even when values are identical). */
class EntrySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("CLI query --index: explicit --id, conventional doc_id fallback, loud errors") {
    import spark.implicits._
    val t = tmpDir("cli_id")
    // a table WITHOUT the conventional doc_id column
    (0L until 50L).map(i => (i, s"row number $i text", i % 10))
      .toDF("rid", "body", "v").write.parquet(s"$t/tbl")
    val root = s"$t/root"
    vfsidx.query.QueryParser.buildIndexes(spark, spark.read.parquet(s"$t/tbl"),
      "rid", Seq("body"), Seq("v"), root)
    // no --id and no doc_id -> loud error, never a columns.head guess
    intercept[IllegalArgumentException] {
      vfsidx.Main.dispatch(spark,
        Array("query", s"$t/tbl", """body.search("number")"""),
        "plain", Some(root), None)
    }
    // --id naming a missing column -> loud
    intercept[IllegalArgumentException] {
      vfsidx.Main.dispatch(spark, Array("query", s"$t/tbl", "v == 3"),
        "plain", Some(root), Some("nope"))
    }
    // explicit --id drives the indexed path
    vfsidx.Main.dispatch(spark, Array("query", s"$t/tbl", "v == 3"),
      "plain", Some(root), Some("rid"))
  }

  test("all queries run at sf0.001 and oracled ones return deterministic schemas") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect() // must execute, not just plan
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage.take(120)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
