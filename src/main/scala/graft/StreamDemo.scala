package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming demo main: feeds event batches through a MemoryStream into
  * the watermarked session-window pipeline and prints the emitted
  * sessions. Shows the engine's Structured Streaming surface end-to-end
  * (source → watermark → stateful session aggregation → sink). */
object StreamDemo {
  case class Ev(ts: Timestamp, user_id: Long, event_type: String,
      value: Double)

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "graft-stream-demo")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    val sessions = EventStreams.sessionize(stream.toDF(),
      gap = "10 minutes", watermark = "10 minutes")
    val query = sessions.writeStream.format("memory")
      .queryName("demo_sessions").outputMode("append").start()

    def ts(s: String) = Timestamp.valueOf(s)
    stream.addData(
      Ev(ts("2024-01-01 10:00:00"), 7, "view", 1.0),
      Ev(ts("2024-01-01 10:05:00"), 7, "click", 2.0),
      Ev(ts("2024-01-01 10:35:00"), 7, "purchase", 10.0),
      Ev(ts("2024-01-01 10:02:00"), 8, "view", 1.0))
    query.processAllAvailable()
    // watermark-advancing batch closes the open sessions
    stream.addData(Ev(ts("2024-01-01 12:00:00"), 99, "view", 0.0))
    query.processAllAvailable()

    println("[streamdemo] emitted sessions:")
    spark.table("demo_sessions").orderBy("user_id", "session_start")
      .show(truncate = false)
    val n = spark.table("demo_sessions").count()
    query.stop()
    require(n >= 3, s"expected >=3 closed sessions, got $n")
    println(s"[streamdemo] closed sessions=$n")

    // custom keyed state via mapGroupsWithState: profiles accumulate
    // across micro-batches
    import graft.streaming.EventStreams.UserEvent
    val profileStream = MemoryStream[UserEvent]
    val profiles = EventStreams.userProfiles(profileStream.toDS(),
      vipThreshold = 50.0)
    val pq = profiles.toDF().writeStream.format("memory")
      .queryName("demo_profiles").outputMode("update").start()
    profileStream.addData(UserEvent(7, "view", 10.0),
      UserEvent(7, "purchase", 30.0))
    pq.processAllAvailable()
    profileStream.addData(UserEvent(7, "purchase", 25.0))
    pq.processAllAvailable()
    println("[streamdemo] stateful profiles (latest):")
    spark.table("demo_profiles").orderBy(col("n_events").desc)
      .show(truncate = false)
    pq.stop()
    spark.stop()
  }
}
