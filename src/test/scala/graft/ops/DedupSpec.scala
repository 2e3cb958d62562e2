package graft.ops

import org.apache.spark.sql.functions._
import vfsidx.SparkTestBase
import vfsidx.tokenize.Tokenizer

/** Differential tests for the dedup suite on a corpus with PLANTED
  * near-duplicates (the driver's testdata has none), mirroring the
  * reference's differential-oracle pattern (bsearch vs scan,
  * /root/reference/vfsindex_test.go:177-201): MinHash+LSH candidates must
  * recover exactly the pairs exact all-pairs Jaccard finds. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  /** 40 base docs + 10 near-dup copies (one word changed) + 5 exact copies. */
  private lazy val dir: String = {
    val d = tmpDir("dedupdocs")
    val rng = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val nearDups = (0 until 10).map { j =>
      val (srcId, text) = base(j)
      val ws = text.split(" "); ws(15) = "CHANGED"
      (100L + srcId, ws.mkString(" "))
    }
    val exactDups = (0 until 5).map(j => (200L + base(j)._1, base(j)._2))
    val all = base ++ nearDups ++ exactDups
    all.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synth"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def exactPairs: Set[(Long, Long)] = {
    // brute-force all-pairs Jaccard on the driver (55 docs -> trivial)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) => id -> Tokenizer.shingles(t, Dedup.ShingleN).toSet }.toMap
    (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= Dedup.JaccardThreshold
    } yield (a, b)).toSet
  }

  test("minhash LSH finds exactly the exact-Jaccard pairs on planted near-dups") {
    val got = Dedup.minhashLsh(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val expected = exactPairs
    assert(expected.nonEmpty, "planted dups must produce pairs")
    // LSH verify step filters false positives, so got ⊆ expected always;
    // recall on planted near-dups (1-word edits, high Jaccard) must be total.
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("degenerate bucket: 1k identical docs stay bounded by the band cap") {
    // one hot band key (boilerplate-identical corpus) must NOT go quadratic:
    // only the BandCap lowest doc_ids pair up -> C(cap,2) pairs, all jac=1.
    val d = tmpDir("dedupdegen")
    (0 until 1000).map(i => (i.toLong, "the same boilerplate license header text repeated verbatim"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Dedup.minhashLsh(spark, d)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    val cap = Dedup.BandCap
    assert(got.length == cap * (cap - 1) / 2, s"expected C($cap,2) pairs, got ${got.length}")
    assert(got.forall { case (a, b) => a < cap && b < cap && a < b })
  }

  test("exact dedup groups exact copies under the smallest doc_id") {
    val res = Dedup.exact(spark, dir)
      .filter($"n_copies" > 1)
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(res == (0 until 5).map(i => (i.toLong, 2L)).toSet)
  }

  test("simhash of an exact copy equals the original; near-dup is close") {
    val sim = Dedup.simhash(spark, dir)
      .as[(Long, Int)].collect().toMap
    (0 until 5).foreach(i => assert(sim(i.toLong) == sim(200L + i)))
    val hamming = (0 until 10).map { j =>
      Integer.bitCount(sim(j.toLong) ^ sim(100L + j))
    }
    assert(hamming.count(_ <= 4) >= 7,
      s"near-dups should mostly be within hamming 4 of source: $hamming")
  }
}
