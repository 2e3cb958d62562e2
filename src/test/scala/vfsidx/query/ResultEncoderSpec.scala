package vfsidx.query

import vfsidx.SparkTestBase

/** Round-trip: rows emitted as JSON/CSV must decode back to the same rows
  * (the reference's S9 result-streaming surface). */
class ResultEncoderSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "plain", 1.5),
    (2L, "comma, inside", -0.25),
    (3L, "quote \" and\nnewline", 0.0),
    (4L, "日本語テキスト", 42.0)
  ).toDF("doc_id", "text", "score")

  test("JSON lines round-trip through spark.read.json") {
    val lines = ResultEncoder.jsonLines(df).toSeq
    assert(lines.size == 4)
    val back = spark.read.json(spark.createDataset(lines))
      .select($"doc_id", $"text", $"score")
      .as[(Long, String, Double)].collect().toSet
    assert(back == df.as[(Long, String, Double)].collect().toSet)
  }

  test("CSV lines round-trip through spark csv reader (quoting exercised)") {
    val lines = ResultEncoder.csvLines(df).toSeq
    assert(lines.head == "doc_id,text,score")
    val f = java.nio.file.Files.createTempFile("enc_csv_", ".csv")
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    val back = spark.read
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .csv(f.toString)
      .select($"doc_id".cast("long"), $"text", $"score".cast("double"))
      .as[(Long, String, Double)].collect().toSet
    assert(back == df.as[(Long, String, Double)].collect().toSet)
  }
}
