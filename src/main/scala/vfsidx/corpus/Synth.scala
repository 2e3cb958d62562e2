package vfsidx.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import java.security.MessageDigest

/** One row of the source-code corpus (the `input_hint` Iceberg-table shape
  * plus the fidelity/id columns FIXTURES.md §2 specifies). */
final case class SourceFile(
    doc_id: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    sha256: String)

/** Deterministic synthetic source-code corpus generator.
  *
  * Replaces the reference's golden-index-tarball-from-Google-Drive fixture
  * (/root/reference/vfsindex_test.go:38-59) with a seeded generator: every
  * field of doc i is a pure function of (seed, i), generated *distributed*
  * via `spark.range(n)` so a 200k-doc bench corpus never materializes on the
  * driver — the same construction would synthesize 10^12 rows on a cluster.
  *
  * Term-frequency design (FIXTURES.md §2): a Zipfian identifier pool whose
  * head terms (`the`, `int`, `val`, `return`) land in 30-50% of docs to
  * exercise salted skew handling, a long tail of rare identifiers, per-doc
  * unique needles (`needle_<i>`) for df=1 point lookups, and Japanese comment
  * lines to exercise rune-correct trigram tokenization.
  */
object Synth {

  val Seed = 42L

  // head terms: very high df, to force skew handling
  private val head = Array("the", "int", "val", "return", "if")
  // medium terms
  private val medium = Array(
    "index", "merge", "search", "query", "record", "column", "buffer",
    "stream", "tokenize", "posting", "segment", "shard", "commit", "branch",
    "vector", "matrix", "parse", "encode", "decode", "write", "read", "flush")
  // tail identifier syllables
  private val syll = Array("qa", "ze", "lo", "mi", "tu", "rev", "dak", "pol",
    "xen", "gri", "vus", "nor", "fem", "byt", "hax", "jul", "wok", "sib")
  private val langs = Array("scala", "go", "java", "py", "c")
  private val jpLines = Array(
    "// 北朝鮮による日本人拉致問題",     // reference golden-query string
    "// 検索エンジンの実装",
    "// 鬼滅の刃を検索する",
    "// 活動内容を記録")

  // MessageDigest.getInstance does a synchronized provider lookup — at 32
  // concurrent tasks that lock serializes the whole corpus scan. One digest
  // per thread, reset per use.
  private val sha = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }

  def sha256Hex(s: String): String = {
    val md = sha.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"$b%02x"))
    sb.toString
  }

  /** Content of doc i — pure function of (Seed, i). */
  def genContent(i: Long): String = {
    val rng = new scala.util.Random(Seed * 1000003L + i * 7919L)
    val nLines = 10 + rng.nextInt(40)
    val sb = new StringBuilder
    sb.append(s"// doc $i needle_$i\n")     // df=1 needle per doc
    var l = 0
    while (l < nLines) {
      if (rng.nextInt(20) == 0) sb.append(jpLines(rng.nextInt(jpLines.length))).append('\n')
      else {
        val nTok = 4 + rng.nextInt(10)
        var t = 0
        while (t < nTok) {
          val r = rng.nextInt(100)
          val tok =
            if (r < 35) head(rng.nextInt(head.length))                       // ~35% head
            else if (r < 75) medium(rng.nextInt(medium.length))              // ~40% medium
            else syll(rng.nextInt(syll.length)) + syll(rng.nextInt(syll.length)) +
              rng.nextInt(50)                                                 // tail
          sb.append(tok)
          sb.append(if (t == nTok - 1) "\n" else " ")
          t += 1
        }
      }
      l += 1
    }
    sb.toString
  }

  def genDoc(i: Long): SourceFile = {
    val rng = new scala.util.Random(Seed * 131L + i * 524287L)
    // Zipf-ish repo assignment over 64 repos
    val repo = f"repo-${(math.pow(rng.nextDouble(), 2.0) * 64).toInt}%04d"
    val lang = langs(rng.nextInt(langs.length))
    val ext = lang match {
      case "py" => "py"; case "go" => "go"; case "c" => "c"
      case "java" => "java"; case _ => "scala"
    }
    val path = s"src/d${i % 97}/m${i % 13}/file_$i.$ext"
    val content = genContent(i)
    val commit = sha256Hex(s"$repo/$path@$i").take(40)
    SourceFile(i, repo, path, commit, lang, content, sha256Hex(content))
  }

  /** Distributed synthesis: doc_id = range index, so ids are dense and
    * deterministic regardless of partitioning (SURVEY.md §1.1 docID note). */
  def corpus(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => genDoc(i))
  }
}
