package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ops.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** SURVEY §2.11 test-only rows: the streaming side of the unified
  * batch/stream transforms — file-source replay parity, watermark
  * late-data drop, session merge, dropDuplicates state, foreachBatch
  * sink, mapGroupsWithState. All feeds are deterministic
  * (MemoryStream + processAllAvailable; no wall-clock coupling). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window: stream over file source matches batch") {
    val events = Tables(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_stream_in").toString
    events.write.mode("overwrite").parquet(dir)
    val streamed = spark.readStream
      .schema(events.schema).parquet(dir)
      .transform(StreamingOps.tumbling)
    val q = streamed.writeStream.format("memory")
      .queryName("tumbling_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tumbling_out")
      .orderBy($"window_start", $"event_type").collect()
    val want = StreamingOps.tumbling(events)
      .orderBy($"window_start", $"event_type").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("windowed top-k: incremental aggregate + sink-side rank matches batch") {
    // the aggregate half runs incrementally (complete mode, state keyed
    // on window x type); the rank is the per-sink batch query - the
    // production leaderboard shape windowTopk's scaladoc declares
    val events = Tables(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_stream_tk").toString
    events.write.mode("overwrite").parquet(dir)
    val q = StreamingOps.readEventsStream(spark, dir)
      .transform(StreamingOps.tumbling)
      .writeStream.format("memory")
      .queryName("topk_agg_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"window_start")
      .orderBy($"sum_value".desc, $"event_type")
    val got = spark.table("topk_agg_out")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"window_start", $"rk", $"event_type", $"n", $"sum_value")
      .orderBy($"window_start", $"rk").collect()
    val want = StreamingOps.windowTopk(events)
      .orderBy($"window_start", $"rk").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("sliding window: stream over file source matches batch") {
    val events = Tables(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft_stream_sl").toString
    events.write.mode("overwrite").parquet(dir)
    val q = StreamingOps.readEventsStream(spark, dir)
      .transform(StreamingOps.sliding)
      .writeStream.format("memory")
      .queryName("sliding_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sliding_out")
      .orderBy($"window_start", $"event_type").collect()
    val want = StreamingOps.sliding(events)
      .orderBy($"window_start", $"event_type").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("watermark drops late rows in append mode") {
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory")
      .queryName("wm_out").outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:10:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData((ts("2024-01-01 09:00:00"), "click", 1.0))
      q.processAllAvailable()
      // late row for the long-closed 00:00 window — must be dropped
      mem.addData((ts("2024-01-01 00:20:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wm_out")
      .select($"window.start".cast("string"), $"n").as[(String, Long)]
      .collect().toMap
    assert(rows.get("2024-01-01 00:00:00").contains(1L),
      s"late row must not be counted: $rows")
  }

  test("session windows merge events within the gap") {
    val mem = MemoryStream[(Timestamp, Long, Double)](spark)
    val agg = mem.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory")
      .queryName("sess_out").outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:00:00"), 1L, 1.0),
        (ts("2024-01-01 00:20:00"), 1L, 1.0), // same session (< 30 min)
        (ts("2024-01-01 01:30:00"), 1L, 1.0)) // new session
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("sess_out").select($"n").as[Long]
      .collect().sorted.toSeq
    assert(sessions === Seq(1L, 2L))
  }

  test("streaming dropDuplicates holds state across batches") {
    val mem = MemoryStream[(Timestamp, Long)](spark)
    val dedup = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "1 day")
      .dropDuplicates("event_id")
    val q = dedup.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), 1L))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:01:00"), 1L), // dup from batch 1
        (ts("2024-01-01 00:02:00"), 2L))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("dedup_out").count() === 2)
  }

  test("foreachBatch sink writes each batch exactly once") {
    val outDir = Files.createTempDirectory("graft_febatch").toString
    val mem = MemoryStream[Long](spark)
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = mem.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        assert(seen.add(id), s"batch $id delivered twice")
        df.write.mode("append").parquet(s"$outDir/b$id")
      }
      .start()
    try {
      mem.addData(1L, 2L); q.processAllAvailable()
      mem.addData(3L); q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$outDir/b*").count() === 3)
  }

  test("file→parquet stream resumes from checkpoint exactly-once") {
    val in = Files.createTempDirectory("graft_ckpt_in").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val chk = Files.createTempDirectory("graft_ckpt_state").toString
    val events = Tables(spark, sfDir, "events")
    val schema = events.schema
    def start() = spark.readStream.schema(schema).parquet(in)
      .writeStream.format("parquet")
      .option("checkpointLocation", chk)
      .option("path", out).start()

    events.limit(100).write.mode("append").parquet(s"$in")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() === 100)

    // second batch + RESTART from the same checkpoint: the first files
    // must not be reprocessed (exactly-once), the new ones must land
    events.limit(150).write.mode("append").parquet(s"$in")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() === 250)
  }

  test("stream-stream join with watermarks and a time bound") {
    val clicks = MemoryStream[(Timestamp, Long)](spark)
    val buys = MemoryStream[(Timestamp, Long)](spark)
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "1 hour")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "1 hour")
    val joined = c.join(b,
      expr("c_user = b_user AND b_ts BETWEEN c_ts AND c_ts + INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:00:00"), 2L))
      buys.addData((ts("2024-01-01 00:10:00"), 1L), // within bound → joins
        (ts("2024-01-01 02:00:00"), 2L))            // outside bound → no join
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssj_out").select($"c_user").as[Long].collect().toSeq
    assert(rows === Seq(1L))
  }

  test("stream-stream LEFT OUTER join emits the null row after the watermark passes") {
    // the q_stream_join_outer shape incrementally: an unconverted click
    // must be HELD until the watermark clears ts + bound, then emitted
    // once with null purchase columns
    val clicks = MemoryStream[(Timestamp, Long)](spark)
    val buys = MemoryStream[(Timestamp, Long)](spark)
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val b = buys.toDF().toDF("b_ts", "b_user").withWatermark("b_ts", "10 minutes")
    val joined = c.join(b,
      expr("c_user = b_user AND b_ts >= c_ts AND b_ts < c_ts + INTERVAL 30 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_outer_out").outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 00:00:00"), 1L), // converts
        (ts("2024-01-01 00:00:00"), 2L))              // never converts
      buys.addData((ts("2024-01-01 00:10:00"), 1L))
      q.processAllAvailable()
      // user 2's null row cannot exist yet: its join window is open
      val early = spark.table("ssj_outer_out")
        .filter($"b_ts".isNull).count()
      assert(early === 0)
      // advance BOTH watermarks well past 00:30 → the held click flushes
      clicks.addData((ts("2024-01-01 02:00:00"), 9L))
      buys.addData((ts("2024-01-01 02:00:00"), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val nullRows = spark.table("ssj_outer_out")
      .filter($"b_ts".isNull).select($"c_user").as[Long].collect().toSeq
    assert(nullRows === Seq(2L))
    val matched = spark.table("ssj_outer_out")
      .filter($"b_ts".isNotNull && $"c_user" =!= 9L)
      .select($"c_user").as[Long].collect().toSeq
    assert(matched === Seq(1L))
  }

  test("mapGroupsWithState keeps a running per-key counter") {
    val mem = MemoryStream[(Long, Double)](spark)
    val counted = mem.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
        })
    val q = counted.toDF("user_id", "n").writeStream.format("memory")
      .queryName("state_out").outputMode("update").start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 1.0))
      q.processAllAvailable()
      mem.addData((1L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("state_out").groupBy($"user_id")
      .agg(max($"n").as("n")).as[(Long, Long)].collect().toMap
    assert(last === Map(1L -> 3L, 2L -> 1L))
  }

  test("flatMapGroupsWithState event-time timeout emits the expired session") {
    import org.apache.spark.sql.streaming.OutputMode
    val mem = MemoryStream[(Timestamp, Long)](spark)
    val expired = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "0 seconds")
      .as[(Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Timestamp, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          if (state.hasTimedOut) {
            // watermark passed the session's horizon → emit and clear
            val n = state.get
            state.remove()
            Iterator((user, n))
          } else {
            val events = rows.toSeq
            state.update(state.getOption.getOrElse(0L) + events.size)
            // session expires 10 min after its newest event
            state.setTimeoutTimestamp(
              events.map(_._1.getTime).max + 10 * 60 * 1000)
            Iterator.empty
          }
        })
    val q = expired.toDF("user_id", "n_events")
      .writeStream.format("memory").queryName("timeout_out")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), 7L),
        (ts("2024-01-01 00:05:00"), 7L))
      q.processAllAvailable() // watermark 00:05 < timeout 00:15 — holds
      assert(spark.table("timeout_out").count() === 0)
      mem.addData((ts("2024-01-01 01:00:00"), 8L))
      q.processAllAvailable() // watermark 01:00 > 00:15 — user 7 expires
    } finally q.stop()
    val rows = spark.table("timeout_out")
      .as[(Long, Long)].collect().toSet
    assert(rows === Set((7L, 2L)))
  }

  test("stream-static join enriches a stream with a broadcast dimension") {
    // the remaining §2.11 shape: a stream joined against a STATIC
    // (batch) dim — planned as a per-microbatch broadcast hash join,
    // no streaming state at all
    val dim = Seq((0L, "bronze"), (1L, "silver"), (2L, "gold"))
      .toDF("tier_id", "tier")
    val mem = MemoryStream[(Long, Long)](spark)
    val q = mem.toDF().toDF("event_id", "tier_id")
      .join(dim, "tier_id")
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try {
      mem.addData((10L, 0L), (11L, 2L))
      q.processAllAvailable()
      mem.addData((12L, 1L), (13L, 9L)) // 9 has no dim row → dropped
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ss_join_out")
      .select($"event_id", $"tier").as[(Long, String)].collect().toSet
    assert(rows === Set((10L, "bronze"), (11L, "gold"), (12L, "silver")))
  }

  test("q_stream_late_drop replay matches real microbatch watermark drops") {
    // crafted 3-arrival-hour stream: source user_id=3 lags 15 min, so
    // event 4 (ts 00:46) ARRIVES in hour 1, after the watermark has
    // advanced to 00:59 - 10min = 00:49 → late. Event 6 arrives in
    // hour 2 with watermark 01:30 - 10min = 01:20 → on time.
    val rows = Seq(
      (0L, ts("2024-01-01 00:30:00"), 0L),
      (1L, ts("2024-01-01 00:50:00"), 0L),
      (2L, ts("2024-01-01 00:59:00"), 0L),
      (3L, ts("2024-01-01 01:10:00"), 0L),
      (4L, ts("2024-01-01 00:46:00"), 3L), // arr 01:01 — LATE
      (5L, ts("2024-01-01 01:30:00"), 0L),
      (6L, ts("2024-01-01 01:46:00"), 3L)) // arr 02:01 — on time
    val ev = rows.toDF("event_id", "ts", "user_id")
    val replay = StreamingOps.lateDrop(ev)
      .select($"batch_id", $"n_events", $"n_late")
      .as[(Long, Long, Long)].collect().toSeq
    val base = replay.map(_._1).min
    assert(replay.map { case (b, n, l) => (b - base, n, l) } ===
      Seq((0L, 3L, 0L), (1L, 3L, 1L), (2L, 1L, 0L)))

    // the REAL engine fed the same arrival batches: stateful dedup on
    // (event_id, ts) with the same 10-minute watermark must drop
    // exactly the one row the replay counts late
    val mem = MemoryStream[(Long, Timestamp)](spark)
    val q = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")
      .writeStream.format("memory").queryName("late_parity")
      .outputMode("append").start()
    def feed(ids: Long*): Unit = {
      mem.addData(ids.map(i => (i, rows(i.toInt)._2)))
      q.processAllAvailable()
    }
    try {
      feed(0L, 1L, 2L) // arrival hour 0
      feed(3L, 4L, 5L) // arrival hour 1 (4 is late)
      feed(6L)         // arrival hour 2
    } finally q.stop()
    // assert WHICH rows survived, not just how many — the parity claim
    // is that the engine dropped exactly the row the replay counts late
    val survived = spark.table("late_parity")
      .select($"event_id").as[Long].collect().toSet
    assert(survived === rows.map(_._1).toSet - 4L)
  }

  test("transformWithState runs the per-user running aggregate incrementally") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // the arbitrary-state v2 API requires the RocksDB state store —
    // SparkSpec's shared session builder sets it for the whole suite
    // (the same default every main uses)
    val mem = MemoryStream[(Long, Double)](spark)
    val out = mem.toDS()
      .groupByKey(_._1)
      .transformWithState(new RunningStateProcessor,
        TimeMode.None(), OutputMode.Update())
    val q = out.toDF("user_id", "n_events", "sum_value")
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    try {
      mem.addData((1L, 1.5), (1L, 2.5), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 4.0), (2L, 1.0)) // state must carry over batches
      q.processAllAvailable()
    } finally q.stop()
    // last update per user reflects ALL batches → init ran once and
    // ValueState persisted across microbatches (incremental, not
    // per-batch-reset, execution)
    val last = spark.table("tws_out")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"sum_value").as("s"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(last === Map(1L -> ((3L, 8.0)), 2L -> ((2L, 11.0))))
  }

  test("transformWithState event-time timer expires the session") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // the v2 replacement for flatMapGroupsWithState's EventTimeTimeout
    // (same timeline as that test, same expected emission): a timer is
    // registered 10 min past the session's newest event and re-armed
    // per batch; when the watermark passes it, handleExpiredTimer
    // emits the closed session and clears state
    val mem = MemoryStream[(Timestamp, Long)](spark)
    val out = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "0 seconds")
      .as[(Timestamp, Long)]
      .groupByKey(_._2)
      .transformWithState(new SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF("user_id", "n_events")
      .writeStream.format("memory").queryName("tws_timer_out")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), 7L),
        (ts("2024-01-01 00:05:00"), 7L))
      q.processAllAvailable() // watermark 00:05 < timer 00:15 — holds
      assert(spark.table("tws_timer_out").count() === 0)
      mem.addData((ts("2024-01-01 01:00:00"), 8L))
      q.processAllAvailable() // watermark 01:00 > 00:15 — user 7 fires
    } finally q.stop()
    val rows = spark.table("tws_timer_out")
      .as[(Long, Long)].collect().toSet
    assert(rows === Set((7L, 2L))) // user 8's timer (01:10) never fired
  }

  test("transformWithState TTL expires idle per-key state") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // processing-time TTL on ValueState — the declarative idle-state
    // eviction that replaces manual timeout bookkeeping. Margins are
    // generous both ways: the idle gap (11 s) comfortably exceeds the
    // 10 s TTL, and the back-to-back batches run well inside it. The
    // TTL was 3 s through round 12; under a fully loaded box (the rest
    // of the suite saturating 32 cores) batch scheduling alone can
    // exceed 3 s, expiring state the test expects live — measured flake
    // in the round-13 inherited-state check, green in isolation.
    val mem = MemoryStream[(Long, String)](spark)
    val out = mem.toDS()
      .groupByKey(_._1)
      .transformWithState(new TtlCounterProcessor,
        TimeMode.ProcessingTime(), OutputMode.Update())
    val q = out.toDF("user_id", "tag", "n")
      .writeStream.format("memory").queryName("tws_ttl_out")
      .outputMode("update").start()
    // ProcessingTime mode self-triggers batches to evaluate timers/TTL,
    // so processAllAvailable never settles — poll the sink instead
    def await(n: Long): Unit = {
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (spark.table("tws_ttl_out").count() < n) {
        assert(System.nanoTime < deadline, s"timed out waiting for $n rows")
        Thread.sleep(100)
      }
    }
    try {
      mem.addData((1L, "a"))
      await(1) // count 1
      Thread.sleep(11000) // > 10 s TTL → state "n" expires
      mem.addData((1L, "b"))
      await(2) // expired state reads absent → restarts at 1
      mem.addData((1L, "c"))
      await(3) // within TTL → increments to 2
    } finally q.stop()
    val rows = spark.table("tws_ttl_out")
      .as[(Long, String, Long)].collect().toSet
    assert(rows === Set((1L, "a", 1L), (1L, "b", 1L), (1L, "c", 2L)))
  }

  test("transformWithState materializes a CDC changelog latest-wins across batches") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // the streaming twin of q_cdc_apply (ops.Relational.cdcApply):
    // per-key ValueState holds (seq, op, price), each microbatch folds
    // its rows latest-wins, deletes become tombstone state so a stale
    // late update can never resurrect a deleted key (in production the
    // tombstones would carry a TTL; NONE here for determinism)
    val mem = MemoryStream[(Long, String, Double, Long)](spark)
    val out = mem.toDS()
      .groupByKey(_._1)
      .transformWithState(new CdcLatestProcessor,
        TimeMode.None(), OutputMode.Update())
    val q = out.toDF("k", "op", "price", "seq")
      .writeStream.format("memory").queryName("tws_cdc_out")
      .outputMode("update").start()
    try {
      mem.addData((1L, "I", 10.0, 1L), (2L, "I", 20.0, 2L),
        (1L, "U", 11.0, 3L)) // intra-batch latest-wins: seq 3 beats 1
      q.processAllAvailable()
      mem.addData((2L, "D", 0.0, 4L), (1L, "U", 99.0, 4L),
        (1L, "U", 12.0, 5L), (3L, "I", 30.0, 6L))
      q.processAllAvailable()
      mem.addData((2L, "U", 77.0, 1L)) // stale: must not resurrect k=2
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("tws_cdc_out")
      .as[(Long, String, Double, Long)].collect().toSeq
    // newest emission per key = the materialized view
    val latest = sink.groupBy(_._1).map { case (k, rs) =>
      k -> rs.maxBy(_._4)
    }
    assert(latest === Map(
      1L -> ((1L, "U", 12.0, 5L)),
      2L -> ((2L, "D", 0.0, 4L)),
      3L -> ((3L, "I", 30.0, 6L))))
    // the stale row changed nothing → no third emission for k=2
    assert(sink.count(_._1 == 2L) === 2)
  }
}

/** Latest-wins CDC state: per-key (seq, op, price) ValueState, updated
  * only when a strictly newer sequence arrives; emits the new
  * materialized row (or tombstone) per change — the streaming twin of
  * [[graft.ops.Relational.cdcApply]]'s row_number-desc semantics.
  * Top-level class: serializes without capturing the suite. */
private class CdcLatestProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String, Double, Long), (Long, String, Double, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}
  @transient private var cur: ValueState[(Long, String, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[(Long, String, Double)]("cur",
      org.apache.spark.sql.Encoders.product[(Long, String, Double)],
      TTLConfig.NONE)

  override def handleInputRows(k: Long,
      rows: Iterator[(Long, String, Double, Long)],
      tv: TimerValues): Iterator[(Long, String, Double, Long)] = {
    val prev = if (cur.exists()) cur.get() else (Long.MinValue, "", 0.0)
    val best = rows.foldLeft(prev) {
      case (acc @ (ps, _, _), (_, op, p, s)) =>
        if (s > ps) (s, op, p) else acc
    }
    if (best._1 != prev._1) {
      cur.update(best)
      Iterator((k, best._2, best._3, best._1))
    } else Iterator.empty
  }
}

/** [[graft.ops.StreamingOps.stateRunning]]'s per-user running
  * (count, sum) as a Spark 4 `StatefulProcessor` — the
  * `transformWithState` arbitrary-state twin of the
  * mapGroupsWithState path. Top-level class so the closure serializes
  * without capturing the suite. */
private class RunningStateProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}
  @transient private var acc: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[(Long, Double)]("acc",
      org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
      tv: TimerValues): Iterator[(Long, Long, Double)] = {
    val prev = if (acc.exists()) acc.get() else (0L, 0.0)
    val next = rows.foldLeft(prev) { case ((n, s), (_, v)) => (n + 1, s + v) }
    acc.update(next)
    Iterator((user, next._1, next._2))
  }
}

/** Event-time SESSION timer: counts a user's events, (re-)arms a timer
  * 10 min past the newest event, and emits the closed session from
  * `handleExpiredTimer` when the watermark passes it — the
  * `transformWithState` twin of the flatMapGroupsWithState
  * EventTimeTimeout pattern. Top-level class: serializes without
  * capturing the suite. */
private class SessionTimerProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (java.sql.Timestamp, Long), (Long, Long)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var n: ValueState[Long] = _
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    n = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(user: Long,
      rows: Iterator[(java.sql.Timestamp, Long)],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val events = rows.toSeq
    n.update((if (n.exists()) n.get() else 0L) + events.size)
    // one live timer per key: re-arm 10 min past the newest event
    if (armed.exists()) getHandle.deleteTimer(armed.get())
    val expiry = events.map(_._1.getTime).max + 10 * 60 * 1000
    getHandle.registerTimer(expiry)
    armed.update(expiry)
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
    val out = (user, n.get())
    n.clear()
    armed.clear()
    Iterator(out)
  }
}

/** Per-key counter whose ValueState carries a 3 s processing-time TTL —
  * state idle past the TTL reads as absent, so the counter restarts:
  * declarative idle-state eviction. Top-level class: serializes
  * without capturing the suite. */
private class TtlCounterProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), (Long, String, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}
  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofSeconds(10)))

  override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
      tv: TimerValues): Iterator[(Long, String, Long)] =
    rows.map { case (_, tag) =>
      val next = (if (n.exists()) n.get() else 0L) + 1
      n.update(next)
      (user, tag, next)
    }
}
