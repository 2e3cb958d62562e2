package graft.ops

import org.apache.spark.sql.functions._
import vfsidx.SparkTestBase

/** The streaming operators replay the events table as THREE micro-batches
  * (two event-time halves + the watermark-flush sentinel), so these tests
  * prove cross-batch correctness: Append-mode windows must equal the batch
  * aggregate exactly (every window emitted exactly once), and GroupState
  * sessionization must merge sessions across the batch boundary. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("append-mode window agg == batch aggregation (all windows flushed, none duplicated)") {
    val streamed = Streaming.windowAgg(spark, dir)
      .as[(java.time.LocalDateTime, String, Long, Double)].collect().toSeq
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window($"ts".cast("timestamp"), "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .select($"w.start".cast("timestamp_ntz").as("ws"), $"event_type", $"n", $"total")
      .orderBy($"ws", $"event_type")
      .as[(java.time.LocalDateTime, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
    assert(!streamed.exists(_._2 == "__flush__"), "sentinel window must never emit")
  }

  test("stateful sessions merge across micro-batches == batch sessionization") {
    val streamed = Streaming.statefulSessions(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = {
      val e = spark.read.parquet(s"$dir/events.parquet")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      e.withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("new_sess",
          when($"prev".isNull ||
            unix_millis($"ts".cast("timestamp")) - unix_millis($"prev".cast("timestamp")) > Streaming.SessionGapMs, 1L)
            .otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
        .as[(Long, Long, Long)].collect().toSeq
    }
    assert(streamed == batch)
  }
}
