package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface for the events table.
  *
  * The reference is pure batch over an HDFS snapshot (SURVEY §2.8) — these
  * are the engine additions a continuously-ingesting deployment needs. Each
  * streaming transform has a batch twin with identical semantics: the batch
  * twin is what the DuckDB oracle checks (`sessionize_batch` in SparkEntry),
  * the streaming path is covered by MemoryStream specs.
  */
object EventStream {

  val EventSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** File-stream source wiring (production: a landing directory of parquet
    * drops; schema must be pinned for streams).
    */
  def fromParquetDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).parquet(dir)

  /** Watermarked hourly tumbling counts — streaming twin of the
    * `events_window_hourly` batch query. Late rows beyond the watermark are
    * dropped; output appends one row per (hour, event_type) when finalized.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  // ---- sessionization --------------------------------------------------

  case class Ev(ts: java.sql.Timestamp, user_id: Long)
  case class SessionAcc(startUs: Long, lastUs: Long, n: Long)
  case class Session(user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  /** Stateful streaming sessionization: events within `gapSec` of each other
    * belong to one session per user; a session closes when the watermark
    * passes its last event + gap (event-time timeout), emitting one row.
    */
  def sessionize(events: Dataset[Ev], gapSec: Long, watermark: String = "2 hours")
                (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L

    def update(userId: Long, batch: Iterator[Ev], state: GroupState[SessionAcc]): Iterator[Session] = {
      if (batch.isEmpty && state.hasTimedOut) {
        val s = state.get; state.remove()
        return Iterator.single(Session(userId, s.startUs, s.lastUs, s.n))
      }
      val incoming = batch.map(e => e.ts.getTime * 1000L +
        (e.ts.getNanos % 1000000) / 1000L).toArray.sorted
      var acc = state.getOption.orNull
      val out = Seq.newBuilder[Session]
      incoming.foreach { tUs =>
        acc match {
          case null => acc = SessionAcc(tUs, tUs, 1)
          case a if tUs - a.lastUs <= gapUs =>
            acc = SessionAcc(a.startUs, math.max(a.lastUs, tUs), a.n + 1)
          case a => // gap exceeded: close previous, open new
            out += Session(userId, a.startUs, a.lastUs, a.n)
            acc = SessionAcc(tUs, tUs, 1)
        }
      }
      state.update(acc)
      state.setTimeoutTimestamp(acc.lastUs / 1000L + gapSec * 1000L)
      out.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Batch twin of [[sessionize]] (identical session boundaries), expressed
    * relationally — lag + running session counter + group. `tsUs` must be a
    * BIGINT epoch-microseconds column. Oracle-checkable.
    */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val gapUs = gapSec * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("new_sess",
        when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum("new_sess").over(wRun))
      .groupBy("user_id", "sess_id")
      .agg(min("ts_us").as("session_start_us"), max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .drop("sess_id")
  }
}
