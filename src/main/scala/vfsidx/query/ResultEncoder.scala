package vfsidx.query

import org.apache.spark.sql.DataFrame

/** Result encoders for the CLI — the reference streams matched records back
  * out as JSON or CSV (/root/reference/search_finder.go:426-488). JSON rides
  * Spark's own row->JSON encoder (schema-faithful, codegen'd, distributed);
  * CSV is RFC-4180-quoted with a header line. Both stream partition-wise via
  * toLocalIterator so a large result never materializes on the driver at
  * once. */
object ResultEncoder {

  def jsonLines(df: DataFrame): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    df.toJSON.toLocalIterator().asScala
  }

  private def csvField(v: Any): String = {
    val s = if (v == null) "" else v.toString
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
  }

  def csvLines(df: DataFrame): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    val header = df.columns.map(csvField).mkString(",")
    Iterator.single(header) ++ df.toLocalIterator().asScala.map { row =>
      (0 until row.length).map(i => csvField(row.get(i))).mkString(",")
    }
  }

  /** Print `df` to stdout in the requested mode ("json" | "csv" | "plain"). */
  def emit(df: DataFrame, mode: String, limit: Int = Int.MaxValue): Unit = mode match {
    case "json" => jsonLines(df.limit(limit)).foreach(println)
    case "csv"  => csvLines(df.limit(limit)).foreach(println)
    case _      => df.limit(limit).collect()
      .foreach(r => println("  " + r.mkString(" | ").take(120)))
  }
}
