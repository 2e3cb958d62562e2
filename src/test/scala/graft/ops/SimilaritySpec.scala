package graft.ops

import vfsidx.SparkTestBase

/** ANN quality: the LSH-banded path must return a subset of the brute-force
  * ranking with reasonable recall, and every score it reports must equal the
  * brute-force score for that vector. */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("LSH top-k scores agree with brute force; recall@10 >= 0.5") {
    val brute = Similarity.cosineTopK(spark, dir)
      .as[(Long, Double)].collect()
    val lsh = Similarity.lshTopK(spark, dir)
      .as[(Long, Double)].collect()
    assert(brute.length == Similarity.K)
    val bruteMap = Similarity.cosineToProbeAll(spark, dir)
    lsh.foreach { case (id, cos) =>
      assert(math.abs(bruteMap(id) - cos) < 1e-9, s"score mismatch for $id")
    }
    val recall = lsh.map(_._1).toSet.intersect(brute.map(_._1).toSet).size.toDouble / Similarity.K
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("IVF top-k scores agree with brute force; candidates really are cell-restricted") {
    val ivf = Similarity.ivfTopK(spark, dir)
      .as[(Long, Double)].collect()
    assert(ivf.nonEmpty)
    val bruteMap = Similarity.cosineToProbeAll(spark, dir)
    ivf.foreach { case (id, cos) =>
      assert(math.abs(bruteMap(id) - cos) < 1e-9, s"score mismatch for $id")
    }
    // ordering contract
    ivf.sliding(2).foreach {
      case Array((id1, c1), (id2, c2)) => assert(c1 > c2 || (c1 == c2 && id1 < id2))
      case _ =>
    }
    // with NProbe < NList the candidate set must be a strict subset of the
    // table (the probe really skipped cells)
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(ivf.length <= Similarity.K && Similarity.K < total)
  }

  test("brute-force top-k is ordered desc with doc_id tie-break") {
    val rows = Similarity.cosineTopK(spark, dir).as[(Long, Double)].collect()
    rows.sliding(2).foreach {
      case Array((id1, c1), (id2, c2)) =>
        assert(c1 > c2 || (c1 == c2 && id1 < id2))
      case _ =>
    }
  }
}
