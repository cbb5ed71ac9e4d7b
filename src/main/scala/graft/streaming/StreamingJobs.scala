package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming counterparts of the batch event analytics in
  * graft.queries.EventQueries. The reference is a file-triggered
  * micro-batch system (SURVEY §2.9) whose exact semantics map to a file
  * source + Trigger.AvailableNow; these transforms are written against
  * unbounded DataFrames so the same code runs on `readStream` input
  * (tested via MemoryStream) and on batch input.
  */
object StreamingJobs {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a parquet event directory — the streaming
    * front door matching the reference's incoming-directory watch
    * (handlers/batch_processing.py:390-398). Drive it with
    * Trigger.AvailableNow for the reference's drain-then-stop batches.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling daily window per event type — the streaming form of
    * EventQueries.q_events_tumbling_daily. With a watermark the state
    * store evicts windows older than the allowed lateness.
    */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").cast(DateType).as("day"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows with a 30-minute inactivity gap — the native
    * streaming form of EventQueries.q_events_sessionize (session_window
    * merges/extends sessions as late rows arrive; state is scoped per
    * user_id so it shards across executors).
    */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))
}
