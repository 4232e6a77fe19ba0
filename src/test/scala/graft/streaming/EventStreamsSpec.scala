package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed token counts over a micro-batch stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val q = EventStreams.windowedTokenCounts(
      input.toDF().toDF("ts", "text"), "5 minutes", "10 minutes")
    input.addData((ts(0), "big data"), (ts(1), "data"), (ts(7), "data"))
    EventStreams.runToMemory(q, "tok_counts", OutputMode.Complete())
    val rows = spark.table("tok_counts")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      ("2024-01-01 10:00:00.0", "big", 1L),
      ("2024-01-01 10:00:00.0", "data", 2L),
      ("2024-01-01 10:05:00.0", "data", 1L)))
  }

  test("chunk stream emits strided windows statelessly in append mode") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.chunkStream(
      input.toDF().toDF("doc_id", "text"), window = 5, stride = 3)
    input.addData((1L, "abcdefgh"), (2L, "xy"))
    // append mode with no watermark/state: pure projection streams through
    EventStreams.runToMemory(q, "chunks", OutputMode.Append())
    val rows = spark.table("chunks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(
      (1L, 0L, "abcde"), (1L, 3L, "defgh"), (1L, 6L, "gh"),
      (2L, 0L, "xy")))
  }

  test("windowed event counts with watermark drop late data in append mode") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val out = EventStreams.windowedCounts(df, "5 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("ev_counts")
      .outputMode(OutputMode.Append()).start()
    // one micro-batch per addData so the watermark actually advances
    input.addData((1L, ts(0), "click", 1.0), (2L, ts(2), "click", 2.0))
    q.processAllAvailable()
    input.addData((3L, ts(20), "view", 1.0)) // advances watermark past 10:05
    q.processAllAvailable()
    input.addData((4L, ts(1), "click", 9.0)) // late beyond watermark: dropped
    q.processAllAvailable()
    input.addData((5L, ts(30), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("ev_counts")
      .select(col("bucket").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the 10:00 click window was finalized with 2 events (late #4 dropped)
    assert(emitted.contains(("2024-01-01 10:00:00", "click", 2L)))
    assert(!emitted.exists { case (_, t, n) => t == "click" && n == 3L })
  }

  test("streaming dedup drops in-watermark repeats and bounds state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val out = EventStreams.dedupStream(
      input.toDF().toDF("ts", "digest"), "ts", "10 minutes", Seq("digest"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    // one micro-batch per addData so the watermark actually advances
    input.addData((ts(0), "A"), (ts(1), "A"), (ts(2), "B")) // dup A dropped
    q.processAllAvailable()
    input.addData((ts(5), "A")) // still within watermark of first A: dropped
    q.processAllAvailable()
    input.addData((ts(40), "C")) // watermark jumps past A's expiry
    q.processAllAvailable()
    input.addData((ts(45), "A")) // A's dedup state evicted: emitted again
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("dedup").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1))).toSet
    assert(emitted == Set(
      ("2024-01-01 10:00:00.0", "A"),
      ("2024-01-01 10:02:00.0", "B"),
      ("2024-01-01 10:40:00.0", "C"),
      ("2024-01-01 10:45:00.0", "A")))
  }

  test("stream-static near-dup flagging against a corpus band index") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely different reference material here today"))
      .toDF("doc_id", "text")
    val index = EventStreams.corpusBandIndex(corpus)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = EventStreams.nearDupFlags(
      input.toDF().toDF("ts", "doc_id", "text"), index)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      // exact copy of corpus doc 100: identical signature, must flag
      (ts(0), 1L, "the quick brown fox jumps over the lazy dog"),
      // novel content: no shared shingles, must pass unflagged
      (ts(1), 2L, "entirely novel words that match no corpus shingle set"))
    q.processAllAvailable()
    input.addData((ts(30), 3L, "advance the watermark past the first batch"))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("neardup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("stream-stream interval join attributes purchases to recent views") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val views     = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val out = EventStreams.intervalJoin(
      views.toDF().toDF("event_id", "ts", "user_id"),
      purchases.toDF().toDF("event_id", "ts", "user_id"),
      maxLagSecs = 1800)
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    views.addData((1L, ts(0), 100L), (2L, ts(5), 200L), (3L, ts(5), 300L))
    purchases.addData(
      (10L, ts(20), 100L), // 20 min after view 1: attributed
      (11L, ts(50), 100L), // 50 min after view 1: outside the lag window
      (12L, ts(10), 200L), //  5 min after view 2: attributed
      (13L, ts(0), 300L))  // before view 3: never attributed
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("attrib")
      .select("user_id", "cause_id", "effect_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((100L, 1L, 10L), (200L, 2L, 12L)))
  }

  test("stateful sessionization emits per-user session aggregates") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val input = MemoryStream[EventStreams.Event]
    val out = EventStreams.sessionize(input.toDS(), gapSecs = 1800)
    input.addData(
      EventStreams.Event(1, ts(0), 100, "click", 1.0),
      EventStreams.Event(2, ts(10), 100, "view", 1.0),
      EventStreams.Event(3, ts(5), 200, "click", 1.0))
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    // processAllAvailable() never settles with processing-time timeouts
    // (the engine keeps scheduling timeout-check batches), so poll the sink.
    val expected = Set((100L, 2L, 600L), (200L, 1L, 0L))
    def rows() = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val deadline = System.currentTimeMillis + 60000
    while (System.currentTimeMillis < deadline && rows() != expected)
      Thread.sleep(250)
    q.stop()
    assert(rows() == expected)
  }

  test("foreachBatch CDC upsert converges to keep-latest across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tableDir = graft.SparkSpec.tempDir("upsert") + "/state"
    val ckptDir  = graft.SparkSpec.tempDir("upsert_ckpt")
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val df = input.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = EventStreams.upsertLatestStream(df, tableDir, ckptDir)
    // batch 1: two users
    input.addData((1L, ts(0), 100L, "view"), (2L, ts(1), 200L, "view"))
    q.processAllAvailable()
    // batch 2: user 100 updated (newer ts), user 300 new, user 200 gets a
    // LATE event (older ts) that must NOT overwrite the newer state
    input.addData((3L, ts(5), 100L, "purchase"), (4L, ts(2), 300L, "view"),
      (5L, ts(0), 200L, "stale"))
    q.processAllAvailable()
    q.stop()
    val state = spark.read.parquet(tableDir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("latest_event_id"), r.getAs[String]("latest_type")))).toMap
    assert(state == Map(
      100L -> ((3L, "purchase")),
      200L -> ((2L, "view")),
      300L -> ((4L, "view"))))
    // and it matches the batch q74 logic applied to the full history
    assert(state.size == 3)
  }

  test("session_window sessions close at the watermark and match sessionize") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.sessionWindowCounts(
        input.toDF().toDF("ts", "user_id"), gapSecs = 1800)
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append()).start()
    // batch 1: two users; user 100 has a second session >gap later
    input.addData((ts(0), 100L), (ts(10), 100L), (ts(5), 200L))
    q.processAllAvailable()
    input.addData((Timestamp.valueOf("2024-01-01 11:40:00"), 100L))
    q.processAllAvailable()
    // batch 3: next-day event drives the watermark past every Jan-1 session
    input.addData((Timestamp.valueOf("2024-01-02 10:00:00"), 999L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_win").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3))).toSet
    // same sessions the mapGroupsWithState sessionizer produces for this
    // input (first→last span, event count); 999's session is still open
    assert(rows == Set(
      (100L, "2024-01-01 10:00:00.0", 600L, 2L),
      (200L, "2024-01-01 10:05:00.0", 0L, 1L),
      (100L, "2024-01-01 11:40:00.0", 0L, 1L)))
  }

  test("streaming term-stats maintenance equals the batch recompute") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tableDir = graft.SparkSpec.tempDir("tstats") + "/table"
    val ckptDir = graft.SparkSpec.tempDir("tstats_ckpt")
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.termStatsStream(
      input.toDF().toDF("doc_id", "text"), tableDir, ckptDir)
    input.addData((1L, "a b a"), (2L, "b c"))
    q.processAllAvailable()
    input.addData((3L, "a d d a"))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(tableDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // hand recompute over all three docs: (df, tf, tdsum[=Σ dl over docs])
    assert(got == Map(
      "a" -> ((2L, 4L, 7L)), // docs 1,3; tf 2+2; dl 3+4
      "b" -> ((2L, 2L, 5L)), // docs 1,2; dl 3+2
      "c" -> ((1L, 1L, 2L)),
      "d" -> ((1L, 2L, 4L))))
  }

  test("Aho-Corasick blocklist scan runs statelessly over a doc stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val out = graft.operators.AhoCorasick.scan(
      input.toDF().toDF("doc_id", "text"), Seq("table hash", "slow key"))
    input.addData(
      (1L, "the table hash join and the slow key again table hash"),
      (2L, "nothing banned"))
    // stateless mapPartitions: flows through append mode, no watermark
    EventStreams.runToMemory(out, "blocked", OutputMode.Append())
    val rows = spark.table("blocked").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 3L, 2L)))
  }

  test("file-source stream over the events parquet matches batch totals") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // the file source wants a directory of files, not a bare file
    val streamDir = graft.SparkSpec.tempDir("ev_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(streamDir, "events.parquet"))
    val q = EventStreams.eventsFileStream(spark, streamDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ev_file")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ev_file").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch && streamed.values.sum > 0)
  }

  test("event-time timers close sessions when the watermark passes the gap") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStreams.Event]
      val out = EventStreams.eventTimeSessions(input.toDS(), gapSecs = 1800)
      val q = out.writeStream.format("memory").queryName("et_sessions")
        .outputMode(OutputMode.Append()).start()
      // batch 1: user 100 at 10:00 and 10:10; user 200 at 10:05
      input.addData(
        EventStreams.Event(1, ts(0), 100, "click", 1.0),
        EventStreams.Event(2, ts(10), 100, "view", 1.0),
        EventStreams.Event(3, ts(5), 200, "click", 1.0))
      q.processAllAvailable()
      // watermark is still 10:10 — nothing may close yet
      assert(spark.table("et_sessions").isEmpty)
      // batch 2: an 11:30 event for user 300 pushes the watermark past
      // both 10:10+30min and 10:05+30min — users 100 and 200 close;
      // user 300's own session stays open (its timer is at 12:00)
      input.addData(EventStreams.Event(4,
        Timestamp.valueOf("2024-01-01 11:30:00"), 300, "click", 1.0))
      q.processAllAvailable()
      // the watermark advances one batch behind the data; run an empty
      // extra batch so the timer sweep sees 11:30
      input.addData(EventStreams.Event(5,
        Timestamp.valueOf("2024-01-01 11:31:00"), 300, "click", 1.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("et_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((100L, 2L, 600L), (200L, 1L, 0L)))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState running-distinct survives batches and reorders") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    // transformWithState requires the RocksDB state store; scope it to
    // this query so the other suites keep the default provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStreams.Event]
      val out = EventStreams.runningDistinctTypes(input.toDS())
      val q = out.writeStream.format("memory").queryName("run_distinct")
        .outputMode(OutputMode.Update()).start()
      // batch 1, deliberately out of ts order within the batch: the
      // processor's (ts, event_id) sort must still count click first
      input.addData(
        EventStreams.Event(2, ts(10), 100, "view", 1.0),
        EventStreams.Event(1, ts(0), 100, "click", 1.0),
        EventStreams.Event(5, ts(3), 200, "view", 1.0))
      q.processAllAvailable()
      // batch 2: repeat type (no increment) then a new type — state must
      // have persisted across the micro-batch boundary
      input.addData(
        EventStreams.Event(3, ts(20), 100, "click", 1.0),
        EventStreams.Event(4, ts(30), 100, "purchase", 1.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("run_distinct").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(
        (100L, 1L, 1L), (100L, 2L, 2L), (100L, 3L, 2L), (100L, 4L, 3L),
        (200L, 5L, 1L)))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("bloom dedup stream: drops repeats across batches, keeps firsts, bounded state") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Long)]
      val out = EventStreams.bloomDedupStream(input.toDS(), shards = 8)
      val q = out.writeStream.format("memory").queryName("bloom_dedup")
        .outputMode(OutputMode.Update()).start()
      // batch 1: digests 11,22,33 with an in-batch repeat of 22
      input.addData((1L, 11L), (2L, 22L), (3L, 22L), (4L, 33L))
      q.processAllAvailable()
      // batch 2: cross-batch repeats (11, 33) must be dropped by state
      // persisted in the shard blobs; 44 and 55 are genuinely new
      input.addData((5L, 11L), (6L, 44L), (7L, 33L), (8L, 55L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("bloom_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // first occurrence of each digest only; in-batch tie broken by
      // (digest, doc_id) order -> doc 2 wins digest 22
      assert(got == Set((1L, 11L), (2L, 22L), (4L, 33L), (6L, 44L), (8L, 55L)))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("space-saving heavy hitters: exact under capacity, bounded error over it") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, String)]
      val out = EventStreams.heavyHittersStream(input.toDS(), capacity = 3)
      val q = out.writeStream.format("memory").queryName("heavy_ss")
        .outputMode(OutputMode.Update()).start()
      // batch 1: 3 distinct items (= capacity) -> exact counts, err 0
      input.addData(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"),
        ("g", "b"), ("g", "c"))
      q.processAllAvailable()
      val b1 = spark.table("heavy_ss").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(b1 == Set(("a", 2L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)))
      // batch 2: item d overflows capacity -> evicts the min counter (c,
      // count 1); d enters with cnt 2, err 1 (count overestimates by at
      // most err); a and b keep exact counts across the batch boundary
      input.addData(("g", "d"), ("g", "a"))
      q.processAllAvailable()
      q.stop()
      val b2 = spark.sql(
        "SELECT item, cnt, err FROM heavy_ss").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (k, vs) => vs.maxBy(_._2) }.toSet
      assert(b2.contains(("a", 3L, 0L)))
      assert(b2.contains(("d", 2L, 1L)))
      // SpaceSaving invariant: true count <= cnt <= true count + err
      // (d's true count is 1: 1 <= 2 <= 1 + 1)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("composed ingest pipeline: dedup -> near-dup drop -> term stats in one query") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val tableDir = graft.SparkSpec.tempDir("ingest") + "/table"
    val ckptDir  = graft.SparkSpec.tempDir("ingest_ckpt")
    // standing corpus: near-dups of these must be dropped by the anti-join
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"),
      (101L, "completely different reference material written here today"))
      .toDF("doc_id", "text")
    val index = EventStreams.corpusBandIndex(corpus)
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val q = EventStreams.ingestPipelineStream(
      input.toDF().toDF("doc_id", "ts", "digest", "text"),
      index, tableDir, ckptDir)
    // batch 1: d1 unique; d2 an exact copy of corpus doc 100 (all bands
    // collide -> near-dup drop); d1 replayed in-batch (same digest ->
    // exact-dedup drop)
    input.addData(
      (1L, ts(0), "D1", "alpha beta alpha gamma"),
      (2L, ts(1), "D2", "the quick brown fox jumps over the lazy dog today"),
      (1L, ts(2), "D1", "alpha beta alpha gamma"))
    q.processAllAvailable()
    // batch 2: d1 replayed again (digest still within watermark ->
    // dropped), d3 unique
    input.addData(
      (1L, ts(5), "D1", "alpha beta alpha gamma"),
      (3L, ts(6), "D3", "beta delta"))
    q.processAllAvailable()
    q.stop()
    // expected = the BATCH recompute over exactly the unique, clean docs
    val expectedDir = graft.SparkSpec.tempDir("ingest_expected") + "/table"
    EventStreams.termStatsUpsertBatch(
      Seq((1L, "alpha beta alpha gamma"), (3L, "beta delta"))
        .toDF("doc_id", "text"),
      expectedDir)
    def asMap(dir: String) = spark.read.parquet(dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(asMap(tableDir) == asMap(expectedDir))
    // sanity on the expectation itself
    assert(asMap(expectedDir)("alpha") == ((1L, 2L, 4L)))
    assert(asMap(expectedDir)("beta") == ((2L, 2L, 6L)))

    // replay guard: re-offering an ALREADY-COMMITTED batch id (foreachBatch
    // is at-least-once) must be a no-op — the additive DF/TF/tdsum merge is
    // not idempotent, so without the committed-id marker this replay would
    // double-count; a NEW batch id must still merge
    val before = asMap(tableDir)
    val replay = Seq((9L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    assert(!EventStreams.ingestPipelineBatch(replay, index, tableDir, 1L,
      streamId = ckptDir))
    assert(asMap(tableDir) == before)
    // a batch id beyond anything the stream committed (the stream may have
    // run trailing empty state-cleanup batches, so "2" is not safely new)
    assert(EventStreams.ingestPipelineBatch(replay, index, tableDir, 99L,
      streamId = ckptDir))
    assert(asMap(tableDir)("alpha") == ((2L, 4L, 8L)))

    // a RESTART WITH A FRESH CHECKPOINT resets batch ids to 0; the marker
    // is keyed by stream identity, so the old stream's "committed through
    // 99" must NOT suppress the new stream's batch 0
    val fresh = Seq((10L, "epsilon zeta epsilon")).toDF("doc_id", "text")
    assert(EventStreams.ingestPipelineBatch(fresh, index, tableDir, 0L,
      streamId = ckptDir + "_fresh"))
    assert(asMap(tableDir)("epsilon") == ((1L, 2L, 3L)))
    // ...and the marker now belongs to the new stream: its own replay of
    // batch 0 is skipped
    assert(!EventStreams.ingestPipelineBatch(fresh, index, tableDir, 0L,
      streamId = ckptDir + "_fresh"))
    assert(asMap(tableDir)("epsilon") == ((1L, 2L, 3L)))

    // an unparseable marker (external corruption — the atomic tmp+rename
    // write can't produce one) fails loudly instead of wedging or
    // guessing; written through the Hadoop fs so its checksum sidecar
    // stays consistent and the CORRUPT CONTENT (not a CRC mismatch) is
    // what the guard sees
    val mp = new org.apache.hadoop.fs.Path(tableDir + "__commit")
    val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mo = mfs.create(mp, true)
    try mo.write("not\na number".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally mo.close()
    intercept[IllegalStateException] {
      EventStreams.ingestPipelineBatch(fresh, index, tableDir, 1L,
        streamId = ckptDir + "_fresh")
    }
  }

  test("term-stats reconciliation: diff names divergent tokens, repair restores the recompute") {
    import spark.implicits._
    val tableDir = graft.SparkSpec.tempDir("reconcile") + "/table"
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta delta"),
      (3L, "epsilon")).toDF("doc_id", "text")
    // healthy table: one merge of the full doc set -> diff is EMPTY
    EventStreams.termStatsUpsertBatch(docs, tableDir)
    assert(EventStreams.reconcileTermStats(docs, tableDir).isEmpty)
    // damage it the way the warned-about scenarios do (a batch re-offered
    // into the additive merge after a cross-stream marker reset =
    // double-counted sums), plus a marker to prove repair drops it
    EventStreams.termStatsUpsertBatch(
      Seq((2L, "beta delta")).toDF("doc_id", "text"), tableDir)
    val mp = new org.apache.hadoop.fs.Path(tableDir + "__commit")
    val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mo = mfs.create(mp, true)
    try mo.write("somestream\n7".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally mo.close()
    // the diff names EXACTLY the double-counted tokens, with the expected
    // (recompute) and actual (damaged) sides both visible
    val diff = EventStreams.reconcileTermStats(docs, tableDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)),
         (r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(diff.keySet == Set("beta", "delta"))
    assert(diff("beta") == (((2L, 2L, 6L), (3L, 3L, 8L))))
    assert(diff("delta") == (((1L, 1L, 2L), (2L, 2L, 4L))))
    // a token the table is MISSING shows NULL actuals (full-outer shape)
    val wider = docs.unionByName(Seq((4L, "zeta")).toDF("doc_id", "text"))
    val missing = EventStreams.reconcileTermStats(wider, tableDir)
      .filter(col("token") === "zeta").collect()
    assert(missing.length == 1 && missing.head.isNullAt(4))
    // repair: table becomes the recompute, marker is gone, diff is empty,
    // and a second repair is an idempotent 0-correction pass
    assert(EventStreams.repairTermStats(docs, tableDir) == 2L)
    assert(!mfs.exists(mp))
    assert(EventStreams.reconcileTermStats(docs, tableDir).isEmpty)
    assert(EventStreams.repairTermStats(docs, tableDir) == 0L)
    val beta = spark.read.parquet(tableDir).filter(col("token") === "beta")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(beta.toSeq == Seq((2L, 2L, 6L)))
  }
}
