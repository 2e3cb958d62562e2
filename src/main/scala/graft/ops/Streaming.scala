package graft.ops

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Cross-batch sessionization state: one per user in the state store.
  * Top-level (not nested in an object) — Janino codegen cannot access
  * private nested case classes from generated code. */
case class SessState(lastTsMs: Long, nSessions: Long, nEvents: Long)

/** Structured Streaming operators (§2.9: the reference has no event-time
  * streaming — these are the Spark-native capabilities a streaming ingest of
  * the same corpus needs). Driven as `readStream` over a staged copy of the
  * events parquet with Trigger.AvailableNow + a memory sink, so a batch
  * DuckDB oracle can check the result exactly.
  *
  * Append-mode mechanics: event-time windows only emit once the watermark
  * passes their end, and the trailing windows of a bounded input would
  * otherwise never finalize. The staging dir therefore appends a FLUSH
  * sentinel file (one event far past max(ts) + watermark) as a later
  * micro-batch: it advances the watermark past every real window, the
  * no-data cleanup batch flushes the remaining state, and the sentinel's own
  * window — the only unfinalized one left — is dropped before aggregation.
  * This is exactly how a production stream behaves (new data keeps arriving
  * and closes old windows); the sentinel just simulates "time moves on" for
  * a bounded replay.
  *
  * At scale: the same plan runs against a Kafka/file stream; the watermark
  * bounds window state (Append drops closed windows instead of Complete's
  * rematerialize-everything), tumbling windows shuffle on (window, type)
  * which is low-cardinality, and sessionization state is per-user (keyed
  * state store, merged across micro-batches via GroupState).
  */
object Streaming {

  private val sinkId = new AtomicInteger(0)
  val FlushUser = -1L
  val SessionGapMs = 1800L * 1000L

  private val stagedCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, org.apache.spark.sql.types.StructType)]()

  /** Stage the events table as an ordered multi-file stream directory:
    * the events split into two EVENT-TIME-ordered halves (below/above the
    * median ts), then the watermark-flush sentinel — three mtime-ordered
    * files, and `maxFilesPerTrigger=1` makes each its own micro-batch, so
    * window state and GroupState genuinely merge across batches. */
  private def stageStream(s: SparkSession, dir: String): (String, org.apache.spark.sql.types.StructType) =
    stagedCache.computeIfAbsent(dir, { d =>
      import s.implicits._
      val ev = s.read.parquet(s"$d/events.parquet")
      val schema = ev.schema
      val root = java.nio.file.Files.createTempDirectory("graft_stream_").toString
      val inDir = s"$root/in"
      // all staging through Hadoop FileSystem (like every other write path):
      // on HDFS/S3A the same code stages the replay; java.io would silently
      // no-op off the local machine
      val hconf = s.sparkContext.hadoopConfiguration
      val inPath = new org.apache.hadoop.fs.Path(inDir)
      val fs = inPath.getFileSystem(hconf)
      fs.mkdirs(inPath)
      def stageOne(df: DataFrame, stage: String, name: String, mtime: Long): Unit = {
        df.coalesce(1).write.parquet(stage)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
          .map(_.getPath)
          .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
          .head
        val dst = new org.apache.hadoop.fs.Path(inPath, s"$name.parquet")
        // Hadoop rename reports failure by RETURNING false, not throwing —
        // fail loudly rather than silently staging a replay with a missing file
        require(fs.rename(part, dst), s"rename $part -> $dst failed")
        // the file source orders micro-batches by mtime; -1 leaves atime alone
        fs.setTimes(dst, mtime, -1)
      }
      val now = System.currentTimeMillis()
      val evMs = ev.withColumn("_ms", unix_millis($"ts".cast("timestamp")))
      val midMs = evMs.stat.approxQuantile("_ms", Array(0.5), 0.01)(0)
      stageOne(evMs.filter($"_ms" < midMs).drop("_ms"), s"$root/stage_a", "000_events_a", now - 120000)
      stageOne(evMs.filter($"_ms" >= midMs).drop("_ms"), s"$root/stage_b", "001_events_b", now - 60000)
      // sentinel: far past max(ts) + watermark so every real window closes
      val maxTs = ev.agg(max($"ts")).collect()(0).getAs[java.time.LocalDateTime](0)
      val flushTs = maxTs.plusHours(6)
      val cols = schema.fields.map { f =>
        (f.name, f.dataType.typeName) match {
          case ("user_id", _) => lit(FlushUser).cast(f.dataType).as(f.name)
          case ("ts", _) => lit(flushTs).cast(f.dataType).as(f.name)
          case ("event_type", _) => lit("__flush__").cast(f.dataType).as(f.name)
          case (_, "string") => lit("").cast(f.dataType).as(f.name)
          case _ => lit(0).cast(f.dataType).as(f.name)
        }
      }
      stageOne(ev.limit(1).select(cols.toIndexedSeq: _*), s"$root/stage_flush", "999_flush", now)
      (inDir, schema)
    })

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (inDir, schema) = stageStream(s, dir)
    // ts arrives as TIMESTAMP_NTZ — event-time ops (watermark, window)
    // require TIMESTAMP (session TZ is UTC, so the instant is unchanged).
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withColumn("ts", $"ts".cast("timestamp"))
  }

  private def runToTable(s: SparkSession, out: DataFrame, mode: OutputMode): DataFrame = {
    val name = s"stream_sink_${sinkId.incrementAndGet()}"
    // State-store partition sizing: stateful shuffles inherit
    // spark.sql.shuffle.partitions AT QUERY START, and every micro-batch
    // writes one state file per partition per stateful op. Size to the
    // (small) state cardinality here, exactly as a production job sizes its
    // state store; batch queries keep the session default.
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = out.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(name)
  }

  /** Tumbling 1-hour event-time window aggregation, watermark-bounded state,
    * APPEND output: windows emit exactly once when the watermark closes
    * them, so state is dropped at scale instead of rematerialized every
    * trigger. */
  def windowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOTE: the sentinel is NOT filtered pre-aggregation (a pushed-down
    // filter would drop it before the watermark node and starve the
    // watermark). Its own window is the only one the advanced watermark
    // never closes, so it never reaches the Append sink.
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      // back to NTZ so the parquet type matches the batch/naive oracle
      .select($"w.start".cast("timestamp_ntz").as("ws"), $"event_type", $"n", $"total")
    runToTable(s, agg, OutputMode.Append())
      .orderBy($"ws", $"event_type")
  }

  /** Stateful sessionization via flatMapGroupsWithState (30-min gap), the
    * streaming twin of [[Relational.q13Sessionize]] — same oracle. State
    * (last event time, running session/event counts) persists in the state
    * store and merges across micro-batches: each batch emits the user's
    * cumulative row, and the final read keeps the latest (max n_events) per
    * user — correct however AvailableNow splits the input into batches, as
    * long as files arrive in event-time order (guaranteed by the staging
    * dir; a production feed would bound disorder with a watermark). */
  def statefulSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = eventsStream(s, dir)
      .filter($"user_id" =!= FlushUser)
      .select($"user_id", $"ts", $"event_id").as[Ev]
    val out = evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, UserSessions](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val t = e.ts.getTime
              val newSession = st.lastTsMs == Long.MinValue || t - st.lastTsMs > SessionGapMs
              st = SessState(t, st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
            }
            state.update(st)
            Iterator.single(UserSessions(uid, st.nSessions, st.nEvents))
          }
      }
    val appended = runToTable(s, out.toDF(), OutputMode.Append())
    // one cumulative row per batch a user appeared in -> keep the latest
    appended.groupBy($"user_id")
      .agg(max(struct($"n_events", $"n_sessions")).as("m"))
      .select($"user_id", $"m.n_sessions".as("n_sessions"), $"m.n_events".as("n_events"))
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
