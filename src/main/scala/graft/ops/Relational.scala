package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator demos over the driver's TPC-H-ish parquet
  * (SURVEY.md §2: filters P2-P4, joins J1-J3 generalized, aggregations
  * A1-A4, window/sort/limit W1-W4, set ops §2.6). Each has a DuckDB oracle
  * in [[graft.SparkEntry.oracleSql]] with identical aliases and rounding.
  *
  * Scale notes (100 TB thinking):
  *  - dims (region/nation/customer/supplier) are broadcast explicitly;
  *  - aggregations rely on partial (map-side) aggregation — no extra
  *    repartition before groupBy;
  *  - top-k is orderBy+limit which Spark plans as TakeOrderedAndProject
  *    (per-partition heap + driver merge), never a full sort;
  *  - filters/projections are column predicates so parquet gets
  *    PushedFilters + pruned ReadSchema.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1-style scan + hash aggregate (A3/A1). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Filter + projection pushdown (P2/P4): both reach the parquet scan. */
  def q2Filter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-03-01").cast("timestamp") &&
        $"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Broadcast hash join: fact joins a small dim (J3 generalized). */
  def q3JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(round(sum($"o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  /** Multi-way join chain with broadcast dims + filters (TPC-H Q5 shape).
    *
    * Join ORDER is deliberate (round-6 optimization, guide §3): the ASIA
    * region filter reaches the fact side BEFORE the one big join. Joining
    * li⋈o first (the round-5 shape) moves every order through the heavy
    * join and applies the region filter only at the very end; here orders
    * runs the broadcast dim chain first (~1/5 survive the region filter)
    * and only the surviving orders meet lineitem — same rows and
    * aggregates (inner joins + filter commute), with the heavy join's
    * other side cut ~5x. At bench scale this trades ~0.2 s of AQE
    * broadcast-stage latency (measured A/B: 0.82 s vs 1.00 s steady-state
    * at sf0.1, where whole-orders ALSO fit in a broadcast so the old shape
    * paid nothing for its late filter); at production scale the filtered
    * side is 5x fewer join-input bytes, which dominates. */
  def q4JoinMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    val asiaOrders = o
      .join(c, $"o_custkey" === $"c_custkey")
      .join(n, $"c_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .select($"o_orderkey", $"n_name")
    li.join(asiaOrders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  /** Left-semi join = EXISTS (reference J1's intersection, generalized). */
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fOrders = t(s, dir, "orders").filter($"o_orderstatus" === "F")
    t(s, dir, "customer")
      .join(fOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left-anti join = NOT EXISTS. */
  def q6AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigItems = t(s, dir, "lineitem").filter($"l_quantity" > 49.0)
    t(s, dir, "part")
      .join(bigItems, $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  /** Top-k: planned as TakeOrderedAndProject (W2/W4 analog). */
  def q7TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** Distinct (A4). */
  def q8Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Ranking window function (absent in reference, §2.5). */
  def q9Window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"o_custkey", $"o_orderkey", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Set operations: union / intersect / except (§2.6, absent in reference). */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val big = o.filter($"o_totalprice" > 400000.0).select($"o_custkey")
    val p = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    f.intersect(big).except(p).distinct().orderBy($"o_custkey")
  }

  /** Rollup aggregation (grouping sets family). */
  def q11Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 2).as("qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"), $"cnt", $"qty")
      .orderBy($"rf", $"ls")
  }

  /** Inclusive/exclusive range-bound semantics pinned (reference quirk fix,
    * SURVEY.md §2.2: the reference treats all four comparisons inclusively;
    * we implement strict semantics and pin them here). */
  def q12RangeBounds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").agg(
      sum(when($"l_quantity" > 45.0, 1).otherwise(0)).as("n_gt"),
      sum(when($"l_quantity" >= 45.0, 1).otherwise(0)).as("n_ge"),
      sum(when($"l_quantity" < 5.0, 1).otherwise(0)).as("n_lt"),
      sum(when($"l_quantity" <= 5.0, 1).otherwise(0)).as("n_le"))
  }

  /** Sessionization via gap detection (lag window, 30-min timeout). */
  def q13Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("brk",
        when($"prev_ts".isNull ||
          unix_millis($"ts".cast("timestamp")) - unix_millis($"prev_ts".cast("timestamp")) > 1800000L,
          1).otherwise(0))
      .groupBy($"user_id")
      .agg(sum($"brk").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** Tumbling event-time window aggregation (batch shape of §2.9's
    * streaming idiom; the streaming variant is in [[Streaming]]). */
  def q14WindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .select($"w.start".as("ws"), $"event_type", $"n", $"total")
      .orderBy($"ws", $"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter" -> (q2Filter _),
    "q3_join_broadcast" -> (q3JoinBroadcast _),
    "q4_join_multi" -> (q4JoinMulti _),
    "q5_semijoin" -> (q5SemiJoin _),
    "q6_antijoin" -> (q6AntiJoin _),
    "q7_topk" -> (q7TopK _),
    "q8_distinct" -> (q8Distinct _),
    "q9_window" -> (q9Window _),
    "q10_setops" -> (q10SetOps _),
    "q11_rollup" -> (q11Rollup _),
    "q12_range_bounds" -> (q12RangeBounds _),
    "q13_sessionize" -> (q13Sessionize _),
    "q14_window_agg" -> (q14WindowAgg _))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_price,
        |round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        |round(avg(l_discount),6) AS avg_disc, count(*) AS cnt
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01'
        |AND l_quantity > 45.0 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_broadcast" ->
      """SELECT c_mktsegment, round(sum(o_totalprice),2) AS total, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_join_multi" ->
      """SELECT n_name, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        |count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q6_antijoin" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 49.0)
        |ORDER BY p_partkey""".stripMargin,
    "q7_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q8_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q9_window" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q10_setops" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
        |ORDER BY o_custkey""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        |count(*) AS cnt, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,
    "q12_range_bounds" ->
      """SELECT CAST(sum(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt,
        |CAST(sum(CASE WHEN l_quantity >= 45.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
        |CAST(sum(CASE WHEN l_quantity < 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lt,
        |CAST(sum(CASE WHEN l_quantity <= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_le
        |FROM lineitem""".stripMargin,
    "q13_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
}
