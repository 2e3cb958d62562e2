package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  *  - brute-force cosine top-k: the exactness baseline, a single pruned scan
  *    + TakeOrderedAndProject (per-partition heap, no full sort);
  *  - LSH-bucketed variant: 12 deterministic random hyperplanes (md5-seeded,
  *    engine-portable) -> 12-bit signature -> only candidates sharing the
  *    probe's bucket get exact-scored. At 10^12 rows the signature is the
  *    shuffle/partition key and the probe touches one bucket instead of the
  *    whole table (recall/speed trade measured in SimilaritySpec).
  *
  * Dot products via `zip_with` + `aggregate` higher-order functions —
  * codegen'd column expressions, no UDF (SURVEY.md guidance).
  */
object Similarity {

  val ProbeVec = 0L
  val K = 10
  val NumPlanes = 12
  val Dim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic hyperplane component (p, i) in [-1, 1): md5-seeded so
    * DuckDB can reproduce it exactly (hex-digit arithmetic only). */
  def planeComponent(p: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$i".getBytes("UTF-8"))
    val v = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
    v.toDouble / 32768.0 - 1.0
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine of every vector against the probe vector (as double). */
  private def cosineToProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("emb", transform($"embedding", _.cast("double")))
    val probe = e.filter($"vec_id" === ProbeVec)
      .select($"emb".as("q"), l2($"emb").as("qn"))
    e.crossJoin(broadcast(probe))
      .select($"vec_id", $"label",
        (dot($"emb", $"q") / (l2($"emb") * $"qn")).as("cos"))
  }

  /** All (vec_id -> rounded cosine vs probe) — test support. */
  def cosineToProbeAll(s: SparkSession, dir: String): Map[Long, Double] = {
    import s.implicits._
    cosineToProbe(s, dir)
      .filter($"vec_id" =!= ProbeVec)
      .select($"vec_id", round(round($"cos", 9), 4).as("cos"))
      .as[(Long, Double)].collect().toMap
  }

  /** Brute-force exact cosine top-k. */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cosineToProbe(s, dir)
      .filter($"vec_id" =!= ProbeVec)
      .select($"vec_id", round(round($"cos", 9), 4).as("cos"))
      .orderBy(round($"cos", 9).desc, $"vec_id".asc)
      .limit(K)
  }

  val BandBits = 4   // 12 planes -> 3 bands of 4 bits

  /** Per-vector LSH band values: [[NumPlanes]] hyperplane sign bits grouped
    * into bands of [[BandBits]]. Candidates = vectors sharing ANY band value
    * with the probe (classic banding: boosts recall vs one monolithic
    * signature while keeping each band's bucket space small enough to be the
    * shuffle/partition key at scale). */
  def bandSignature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("emb", transform($"embedding", _.cast("double")))
    val bits = (0 until NumPlanes).map { p =>
      val comps = (0 until Dim).map(i => planeComponent(p, i))
      val proj = aggregate(
        zip_with($"emb", typedLit(comps), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << (p % BandBits))).otherwise(lit(0))
        .as(s"bit$p")
    }
    val nBands = NumPlanes / BandBits
    val bands = (0 until nBands).map { b =>
      (0 until BandBits).map(r => col(s"bit${b * BandBits + r}")).reduce(_ + _)
        .cast("int").as(s"band$b")
    }
    val withBits = e.select(($"vec_id" +: $"emb" +: bits): _*)
    withBits.select($"vec_id", $"emb",
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band_idx"), bands(b).as("band_val"))): _*)).as("bv"))
      .select($"vec_id", $"emb", $"bv.band_idx", $"bv.band_val")
  }

  /** ANN via LSH banding: exact-score only vectors sharing a band with the
    * probe. Returns its top-k (recall vs brute force asserted in
    * SimilaritySpec). */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = bandSignature(s, dir)
    val probe = sig.filter($"vec_id" === ProbeVec)
      .select($"band_idx", $"band_val", $"emb".as("q"), l2($"emb").as("qn"))
    val cand = sig.join(broadcast(probe.select($"band_idx", $"band_val")),
        Seq("band_idx", "band_val"), "left_semi")
      .filter($"vec_id" =!= ProbeVec)
      .select($"vec_id", $"emb").distinct()
    val q = probe.select($"q", $"qn").limit(1)
    cand.crossJoin(broadcast(q))
      .select($"vec_id", round(round(dot($"emb", $"q") / (l2($"emb") * $"qn"), 9), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc)
      .limit(K)
  }

  val NList = 8    // IVF coarse-quantizer cells
  val NProbe = 2   // cells probed per query

  val DupBandCap = 16     // docs paired per (band, value) bucket
  val DupThreshold = 0.2  // cosine near-dup threshold

  /** Embedding-cosine near-duplicate PAIRS (the dedup counterpart of
    * [[lshTopK]]): vectors sharing any LSH band value are candidates —
    * bucket-capped at the [[DupBandCap]] lowest vec_ids exactly like the
    * MinHash band join (a degenerate bucket must not go quadratic) — then
    * exact cosine verifies candidates against [[DupThreshold]]. The band
    * value is the shuffle key at scale; no all-pairs comparison anywhere. */
  def embedCosinePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sig = bandSignature(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"band_idx", $"band_val").orderBy($"vec_id")))
      .filter($"rn" <= DupBandCap)
      .select($"vec_id", $"emb", $"band_idx", $"band_val")
    val cand = sig.as("a").join(sig.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_val" === $"b.band_val" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"),
        $"a.emb".as("e1"), $"b.emb".as("e2"))
      .dropDuplicates("v1", "v2")
    cand
      .withColumn("cos", round(round(
        dot($"e1", $"e2") / (l2($"e1") * l2($"e2")), 9), 6))
      .filter($"cos" >= DupThreshold)
      .select($"v1", $"v2", $"cos")
      .orderBy($"v1", $"v2")
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
    *
    *   1. centroids = the embeddings of [[NList]] fixed vec_ids (data-derived
    *      and deterministic, so DuckDB reproduces them; a production build
    *      would k-means these — the *plan shape* is identical);
    *   2. assignment: every vector -> argmax-cosine centroid (a narrow map
    *      of NList codegen'd dot products; the cell id is the partition/
    *      cluster key at 10^12 rows);
    *   3. query: rank centroids by cosine to the probe, exact-score ONLY the
    *      vectors assigned to the top-[[NProbe]] cells.
    *
    * Ties broken (rounded cosine desc, centroid id asc) on both engines. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("emb", transform($"embedding", _.cast("double")))
    val cents: Seq[(Long, Array[Double])] = e
      .filter($"vec_id" >= 1L && $"vec_id" <= NList.toLong)
      .select($"vec_id", $"emb").as[(Long, Array[Double])]
      .collect().sortBy(_._1).toSeq
    def cNorm(c: Array[Double]) = math.sqrt(c.map(x => x * x).sum)
    def cosTo(c: Array[Double]): Column =
      dot($"emb", typedLit(c.toSeq)) / (l2($"emb") * lit(cNorm(c)))
    // argmax cell: struct max over (rounded cos, -centroid_id)
    val cellStructs = cents.map { case (cid, c) =>
      struct(round(cosTo(c), 9).as("cos"), lit(-cid).as("negc"))
    }
    val assigned = e.select($"vec_id", $"emb",
      (array_max(array(cellStructs: _*)).getField("negc") * -1).as("cell"))
    // probe cells on the driver: NList dot products over one collected row
    val probeEmb = e.filter($"vec_id" === ProbeVec)
      .select($"emb").as[Array[Double]].head()
    val pNorm = cNorm(probeEmb)
    val probeCells = cents.map { case (cid, c) =>
      val cos = c.indices.map(i => c(i) * probeEmb(i)).sum / (cNorm(c) * pNorm)
      (BigDecimal(cos).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, cid)
    }.sortBy { case (cos, cid) => (-cos, cid) }.take(NProbe).map(_._2)
    val q = e.filter($"vec_id" === ProbeVec).select($"emb".as("q"), l2($"emb").as("qn"))
    assigned
      .filter($"cell".isin(probeCells: _*) && $"vec_id" =!= ProbeVec)
      .crossJoin(broadcast(q))
      .select($"vec_id", round(round(dot($"emb", $"q") / (l2($"emb") * $"qn"), 9), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id".asc)
      .limit(K)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> (cosineTopK _),
    "ann_lsh_topk" -> (lshTopK _),
    "ann_ivf_topk" -> (ivfTopK _),
    "dedup_embed_cosine" -> (embedCosinePairs _))

  /** Shared SQL CTE prefix: md5-derived hyperplanes -> per-vector band
    * values (identical to [[bandSignature]]). */
  private val bandsCte =
    s"""planes AS (
       |  SELECT p, i,
       |    ((16*(strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),1,1))-1)
       |     + (strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),2,1))-1)) * 256
       |     + 16*(strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),3,1))-1)
       |     + (strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),4,1))-1)
       |    ) / 32768.0 - 1.0 AS w
       |  FROM generate_series(0, ${NumPlanes - 1}) t(p), generate_series(0, ${Dim - 1}) u(i)),
       |f AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |         CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings),
       |proj AS (
       |  SELECT vec_id, p, sum(v * w) AS pr
       |  FROM f JOIN planes USING (i) GROUP BY 1, 2),
       |bands AS (
       |  SELECT vec_id, p // $BandBits AS band,
       |         CAST(sum(CASE WHEN pr >= 0 THEN 1 << (p % $BandBits) ELSE 0 END) AS INT) AS bval
       |  FROM proj GROUP BY 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ann_cosine_topk" ->
      s"""WITH f AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |q AS (SELECT i, v AS qv FROM f WHERE vec_id = $ProbeVec),
         |sc AS (
         |  SELECT f.vec_id,
         |    sum(f.v * q.qv) / (sqrt(sum(f.v * f.v)) * sqrt(sum(q.qv * q.qv))) AS cos
         |  FROM f JOIN q USING (i) WHERE f.vec_id <> $ProbeVec GROUP BY 1)
         |SELECT vec_id, round(round(cos, 9), 4) AS cos FROM sc
         |ORDER BY round(cos, 9) DESC, vec_id ASC LIMIT $K""".stripMargin,
    // the LSH path is fully reproducible in SQL because the hyperplanes are
    // md5-derived (hex-digit arithmetic only) — same candidates, same scores
    "ann_lsh_topk" ->
      s"""WITH planes AS (
         |  SELECT p, i,
         |    ((16*(strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),1,1))-1)
         |     + (strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),2,1))-1)) * 256
         |     + 16*(strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),3,1))-1)
         |     + (strpos('0123456789abcdef', substr(md5('plane:'||p||':'||i),4,1))-1)
         |    ) / 32768.0 - 1.0 AS w
         |  FROM generate_series(0, ${NumPlanes - 1}) t(p), generate_series(0, ${Dim - 1}) u(i)),
         |f AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |proj AS (
         |  SELECT vec_id, p, sum(v * w) AS pr
         |  FROM f JOIN planes USING (i) GROUP BY 1, 2),
         |bands AS (
         |  SELECT vec_id, p // $BandBits AS band,
         |         CAST(sum(CASE WHEN pr >= 0 THEN 1 << (p % $BandBits) ELSE 0 END) AS INT) AS bval
         |  FROM proj GROUP BY 1, 2),
         |probe AS (SELECT band, bval FROM bands WHERE vec_id = $ProbeVec),
         |cand AS (
         |  SELECT DISTINCT b.vec_id FROM bands b JOIN probe USING (band, bval)
         |  WHERE b.vec_id <> $ProbeVec),
         |q AS (SELECT i, v AS qv FROM f WHERE vec_id = $ProbeVec),
         |sc AS (
         |  SELECT f.vec_id,
         |    sum(f.v * q.qv) / (sqrt(sum(f.v * f.v)) * sqrt(sum(q.qv * q.qv))) AS cos
         |  FROM f JOIN q USING (i) JOIN cand ON cand.vec_id = f.vec_id GROUP BY 1)
         |SELECT vec_id, round(round(cos, 9), 4) AS cos FROM sc
         |ORDER BY round(round(cos, 9), 4) DESC, vec_id ASC LIMIT $K""".stripMargin,
    "dedup_embed_cosine" ->
      s"""WITH $bandsCte,
         |capped AS (
         |  SELECT vec_id, band, bval FROM bands
         |  QUALIFY row_number() OVER (PARTITION BY band, bval ORDER BY vec_id) <= $DupBandCap),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |  FROM capped a JOIN capped b USING (band, bval)
         |  WHERE a.vec_id < b.vec_id),
         |sc AS (
         |  SELECT v1, v2,
         |    round(round(sum(f1.v * f2.v) /
         |      (sqrt(sum(f1.v * f1.v)) * sqrt(sum(f2.v * f2.v))), 9), 6) AS cos
         |  FROM cand
         |  JOIN f f1 ON f1.vec_id = v1
         |  JOIN f f2 ON f2.vec_id = v2 AND f2.i = f1.i
         |  GROUP BY 1, 2)
         |SELECT v1, v2, cos FROM sc WHERE cos >= $DupThreshold
         |ORDER BY v1, v2""".stripMargin,
    // IVF: centroids are rows 1..NList of the table itself, so the whole
    // coarse-quantizer pipeline is reproducible in SQL
    "ann_ivf_topk" ->
      s"""WITH f AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |cent AS (SELECT vec_id AS c, i, v AS cv FROM f WHERE vec_id BETWEEN 1 AND $NList),
         |cos_vc AS (
         |  SELECT f.vec_id, c,
         |    round(sum(v * cv) / (sqrt(sum(v * v)) * sqrt(sum(cv * cv))), 9) AS cvc
         |  FROM f JOIN cent USING (i) GROUP BY 1, 2),
         |assign AS (
         |  SELECT vec_id, c AS cell FROM cos_vc
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cvc DESC, c ASC) = 1),
         |probecells AS (
         |  SELECT c AS cell FROM cos_vc WHERE vec_id = $ProbeVec
         |  QUALIFY row_number() OVER (ORDER BY cvc DESC, c ASC) <= $NProbe),
         |cand AS (
         |  SELECT vec_id FROM assign JOIN probecells USING (cell)
         |  WHERE vec_id <> $ProbeVec),
         |q AS (SELECT i, v AS qv FROM f WHERE vec_id = $ProbeVec),
         |sc AS (
         |  SELECT f.vec_id,
         |    sum(f.v * q.qv) / (sqrt(sum(f.v * f.v)) * sqrt(sum(q.qv * q.qv))) AS cos
         |  FROM f JOIN q USING (i) JOIN cand ON cand.vec_id = f.vec_id GROUP BY 1)
         |SELECT vec_id, round(round(cos, 9), 4) AS cos FROM sc
         |ORDER BY round(round(cos, 9), 4) DESC, vec_id ASC LIMIT $K""".stripMargin)
}
