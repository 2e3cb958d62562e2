package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import vfsidx.tokenize.Tokenizer

/** Deduplication operators for a training-data pipeline: exact (hash
  * groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash. The hash
  * primitive everywhere is md5 — available identically in Spark and DuckDB,
  * so even MinHash signatures are engine-portable and SQL-oracle-checkable.
  *
  * Scale shapes:
  *  - exact dedup: one shuffle on the content hash (map-side combine);
  *  - MinHash LSH: docs -> shingles -> signatures (narrow) -> explode bands
  *    -> shuffle on band key (bounded by band cardinality, no O(n^2));
  *  - SimHash: narrow per-doc bit voting, one groupBy(doc, bit) + one
  *    groupBy(doc) — never pairs anything.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val ShingleN = 3
  val NumHashes = 12      // minhash signature length
  val BandRows = 3        // rows per LSH band -> 4 bands
  val BandCap = 16        // max docs paired per (band, bkey) bucket — see minhashLsh
  val JaccardThreshold = 0.12   // LSH verify threshold (pair space)
  val ProbeThreshold = 0.015    // probe-query threshold (random corpus: max ≈ 0.026)
  val ProbeDoc = 0L

  /** Exact dedup: group by content hash, keep the smallest doc_id. */
  def exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"h")
  }

  /** Distinct word-n-gram shingles per doc (typed flatMap). */
  private def shingleDF(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        Tokenizer.shingles(text, ShingleN).distinct.map(sh => (id, sh))
      }.toDF("doc_id", "sh")
  }

  /** n-gram Jaccard similarity of every doc against a probe doc (linear,
    * not quadratic — the all-pairs variant is [[minhashLsh]]).
    *
    * One tokenize pass, nothing cached: the probe's shingles come from a
    * single-row doc_id-pushdown scan and broadcast; a left join marks
    * matches so per-doc size and intersection come out of the SAME
    * aggregation. */
  def jaccardProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probeSh = docs(s, dir).filter($"doc_id" === ProbeDoc)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (_, text) => Tokenizer.shingles(text, ShingleN).distinct }
      .toDF("sh").withColumn("m", lit(1))
    val nProbe = probeSh.count()
    shingleDF(s, dir)
      .filter($"doc_id" =!= ProbeDoc)
      .join(broadcast(probeSh), Seq("sh"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_sh"), sum($"m").as("n_inter"))
      .filter($"n_inter" > 0)
      .withColumn("jac", round($"n_inter" / ($"n_sh" + nProbe - $"n_inter"), 6))
      .filter($"jac" >= ProbeThreshold)
      .select($"doc_id", $"jac")
      .orderBy($"doc_id")
  }

  /** MinHash signature entry i of a doc = min over its shingles of
    * md5(i || ':' || shingle) (lexicographic min of hex strings — portable
    * across engines, so the whole pipeline incl. banding is DuckDB-oracled).
    * LSH: concat [[BandRows]] signature entries per band, md5 -> band key;
    * docs sharing a band key are candidate pairs; verify candidates with
    * exact Jaccard. Returns verified near-dup pairs.
    *
    * Scale guards:
    *  - '''bucket cap''': only the [[BandCap]] lowest-doc_id docs of a
    *    (band, bkey) bucket pair up. A degenerate band key (thousands of
    *    boilerplate-identical docs) otherwise goes quadratic inside its
    *    bucket and OOMs one task. Deterministic (doc_id order), mirrored
    *    exactly in the SQL oracle via row_number(). Identical docs beyond
    *    the cap are exact duplicates — [[exact]] dedup's job, not LSH's.
    *  - '''no cached shingle explosion''': the verify step semi-joins the
    *    shingle stream down to candidate docs only (a tiny broadcast set)
    *    instead of caching ~10x the corpus in executor memory. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sh = shingleDF(s, dir)
    // All NumHashes minhashes in ONE aggregation pass (12 min() aggregates
    // over the shingle stream) instead of exploding it 12x before the
    // shuffle — same signature values, 1/12th the shuffle rows. The per-doc
    // shingle count rides the SAME aggregation (round-6: the verify step
    // below needs |sh(doc)| — computing it here removes what used to be a
    // separate full tokenize pass + shuffle over the shingle stream).
    val mhAggs = (0 until NumHashes).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), $"sh"))).as(s"mh$i")) :+
      count(lit(1)).as("n_sh")
    val sig = sh.groupBy($"doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    // band key = md5 of the band's minhashes joined in i order — identical
    // to the SQL oracle's md5(string_agg(mh, '|' ORDER BY i))
    val nBands = NumHashes / BandRows
    val bandCols = (0 until nBands).map { b =>
      val ms = (0 until BandRows).map(r => col(s"mh${b * BandRows + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", ms: _*)).as("bkey"))
    }
    val bands = sig
      .select($"doc_id", explode(array(bandCols: _*)).as("bv"))
      .select($"doc_id", $"bv.band", $"bv.bkey")
    // Candidate pairs WITHOUT a self-join: cap each (band, bkey) bucket to
    // its BandCap lowest doc_ids (row_number, as before), then collect the
    // capped bucket — ≤ BandCap ids, so the agg buffer is memory-bounded —
    // in an aggregation that REUSES the window's (band, bkey) partitioning
    // (no new exchange), and enumerate the i<j pairs from the sorted array
    // with codegen'd higher-order functions. The former capped⋈capped
    // self-join consumed the capped subtree twice and built the exact same
    // pair set through a join operator.
    val capped = bands
      .withColumn("rn", row_number().over(
        Window.partitionBy($"band", $"bkey").orderBy($"doc_id")))
      .filter($"rn" <= BandCap)
    val cand = capped
      .groupBy($"band", $"bkey")
      .agg(sort_array(collect_list($"doc_id")).as("ds"))
      .filter(size($"ds") >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))")).as("p"))
      .select($"p.d1", $"p.d2")
      .distinct()
    // verify candidates with exact Jaccard over candidate docs' shingles
    // only — a semi-join prune (AQE broadcasts it when small; an explicit
    // broadcast hint would OOM on a dup-heavy corpus where candidates are
    // a large fraction of the table)
    val candDocs = cand.select($"d1".as("doc_id"))
      .union(cand.select($"d2".as("doc_id"))).distinct()
    val shC = sh.join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = sig.select($"doc_id", $"n_sh")   // off the signature pass
    // |sh(d1) ∩ sh(d2)| via ONE instance of the candidate shingle stream
    // (round 6): each pair fans out to its two member docs, the single shC
    // join tags every (pair, shingle, side) occurrence, and a shingle seen
    // from BOTH sides (n == 2: (doc, sh) is distinct per side and d1 < d2)
    // is an intersection member. The former d1-join + d2-join shape
    // evaluated the tokenize/semi-join subtree twice.
    val pairSides = cand.select($"d1".as("doc_id"), $"d1", $"d2")
      .union(cand.select($"d2".as("doc_id"), $"d1", $"d2"))
    val inter = pairSides
      .join(shC, "doc_id")
      .groupBy($"d1", $"d2", $"sh").agg(count(lit(1)).as("n_side"))
      .filter($"n_side" === 2)
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .withColumn("jac", round($"n_inter" / ($"n1" + $"n2" - $"n_inter"), 6))
      .filter($"jac" >= JaccardThreshold)
      .select($"d1", $"d2", $"jac")
      .orderBy($"d1", $"d2")
  }

  /** Portable 16-bit SimHash: bit j of md5(word) (hex-digit arithmetic only,
    * so DuckDB computes the identical value); per-doc majority vote over all
    * word occurrences. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = docs(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .withColumn("h4", substring(md5($"w"), 1, 4))
    val bits = (0 until 16).map { j =>
      expr(s"(shiftright(instr('0123456789abcdef', substring(h4, ${1 + j / 4}, 1)) - 1, ${3 - j % 4}) & 1)")
        .cast("long").as(s"b$j")
    }
    val voted = w.select(($"doc_id" +: bits): _*)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"),
        (0 until 16).map(j => sum(col(s"b$j")).as(s"s$j")): _*)
    val sim = (0 until 16).map { j =>
      when(col(s"s$j") * 2 > col("n"), lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    voted.select($"doc_id", sim.cast("int").as("simhash")).orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_jaccard_probe" -> (jaccardProbe _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _))

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_jaccard_probe" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
         |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
         |  WHERE len(ws) >= 3),
         |q AS (SELECT s FROM sh WHERE doc_id = $ProbeDoc),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT doc_id, count(*) AS c FROM sh JOIN q USING (s)
         |  WHERE doc_id <> $ProbeDoc GROUP BY 1)
         |SELECT i.doc_id,
         |  round(c * 1.0 / (sz.n + (SELECT n FROM sz WHERE doc_id = $ProbeDoc) - c), 6) AS jac
         |FROM inter i JOIN sz ON i.doc_id = sz.doc_id
         |WHERE c * 1.0 / (sz.n + (SELECT n FROM sz WHERE doc_id = $ProbeDoc) - c) >= $ProbeThreshold
         |ORDER BY i.doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
         |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
         |  WHERE len(ws) >= $ShingleN),
         |sig AS (
         |  SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS mh
         |  FROM sh, LATERAL (SELECT unnest(generate_series(0, ${NumHashes - 1})) AS i) t
         |  GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, i // $BandRows AS band,
         |         md5(string_agg(mh, '|' ORDER BY i)) AS bkey
         |  FROM sig GROUP BY 1, 2),
         |capped AS (
         |  SELECT doc_id, band, bkey
         |  FROM bands
         |  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= $BandCap),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM capped a JOIN capped b USING (band, bkey)
         |  WHERE a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT d1, d2, count(*) AS c
         |  FROM cand
         |  JOIN sh s1 ON s1.doc_id = cand.d1
         |  JOIN sh s2 ON s2.doc_id = cand.d2 AND s2.s = s1.s
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(c * 1.0 / (z1.n + z2.n - c), 6) AS jac
         |FROM inter JOIN sz z1 ON z1.doc_id = d1 JOIN sz z2 ON z2.doc_id = d2
         |WHERE c * 1.0 / (z1.n + z2.n - c) >= $JaccardThreshold
         |ORDER BY d1, d2""".stripMargin,
    "dedup_simhash" ->
      """WITH w AS (
        |  SELECT doc_id, substr(md5(unnest(string_split(text, ' '))), 1, 4) AS h4
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id,
        |    j,
        |    ((strpos('0123456789abcdef', substr(h4, 1 + j // 4, 1)) - 1) >> (3 - j % 4)) & 1 AS b
        |  FROM w, LATERAL (SELECT unnest(generate_series(0, 15)) AS j) t),
        |voted AS (
        |  SELECT doc_id, j, CASE WHEN sum(b) * 2 > count(*) THEN 1 ELSE 0 END AS bit
        |  FROM bits GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(bit * (1 << j)) AS INT) AS simhash
        |FROM voted GROUP BY 1 ORDER BY 1""".stripMargin)
}
