package graft.ops

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Structured Streaming operators (§2.9: the reference has no event-time
  * streaming — these are the Spark-native capabilities a streaming ingest of
  * the same corpus needs). Driven as `readStream` over the events parquet
  * with Trigger.AvailableNow + a memory sink, so a batch DuckDB oracle can
  * check the result exactly.
  *
  * At scale: the same plan runs against a Kafka/file stream; watermark
  * bounds state, tumbling windows shuffle on (window, type) which is
  * low-cardinality, and sessionization state is per-user (keyed state store).
  */
object Streaming {

  private val sinkId = new AtomicInteger(0)

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // file-stream source needs a directory; glob-filter to the events table.
    // ts arrives as TIMESTAMP_NTZ — event-time ops (watermark, window)
    // require TIMESTAMP (session TZ is UTC, so the instant is unchanged).
    s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", $"ts".cast("timestamp"))
  }

  private def runToTable(s: SparkSession, out: DataFrame, mode: OutputMode): DataFrame = {
    val name = s"stream_sink_${sinkId.incrementAndGet()}"
    val q = out.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  /** Tumbling 1-hour event-time window aggregation with watermark. */
  def windowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      // back to NTZ so the parquet type matches the batch/naive oracle
      .select($"w.start".cast("timestamp_ntz").as("ws"), $"event_type", $"n", $"total")
    runToTable(s, agg, OutputMode.Complete())
      .orderBy($"ws", $"event_type")
  }

  /** Stateful sessionization via flatMapGroupsWithState (30-min gap), the
    * streaming twin of [[Relational.q13Sessionize]] — same oracle. */
  def statefulSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = eventsStream(s, dir)
      .select($"user_id", $"ts", $"event_id").as[Ev]
    val out = evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserSessions](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Long]) =>
          val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          var sessions = 0L
          var prev = Long.MinValue
          sorted.foreach { e =>
            if (prev == Long.MinValue || e.ts.getTime - prev > 1800L * 1000L) sessions += 1
            prev = e.ts.getTime
          }
          Iterator.single(UserSessions(uid, sessions, sorted.length.toLong))
      }
    runToTable(s, out.toDF(), OutputMode.Append())
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> (windowAgg _),
    "stream_sessions" -> (statefulSessions _))

  val oracleSql: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
        |count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "stream_sessions" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)
}
