package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming extension: streaming windowed agg must agree
  * with the batch computation of the same input (SURVEY §5.2 #5). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  private val events = Seq(
    (1L, ts(0), 10L, "click", 1.0, """{"k": 1}"""),
    (2L, ts(5), 10L, "click", 2.0, """{"k": 2}"""),
    (3L, ts(10), 11L, "view", 3.0, """{"k": 3}"""),
    (4L, ts(40), 11L, "click", 4.0, """{"k": 4}"""),
    (5L, ts(59), 12L, "view", 5.0, null))

  test("batch tumbling agg groups by epoch-aligned windows") {
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.tumblingAgg(df, "30 minutes")
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("2026-01-01 10:00:00", "click", 2L, 3.0),
      ("2026-01-01 10:00:00", "view", 1L, 3.0),
      ("2026-01-01 10:30:00", "click", 1L, 4.0),
      ("2026-01-01 10:30:00", "view", 1L, 5.0)))
  }

  test("streaming agg over MemoryStream equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.tumblingAgg(sdf.withWatermark("ts", "10 minutes"), "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("agg_out").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      val streamed = spark.table("agg_out")
        .as[(String, String, Long, Double)].collect().toSet
      val batch = EventStreams.tumblingAgg(
          events.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          "30 minutes")
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join equals batch intervalJoin") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = Seq((100L, ts(30), 1L), (101L, ts(50), 1L), (102L, ts(10), 2L))
    val clicks = Seq((200L, ts(15), 1L), (201L, ts(45), 1L), (202L, ts(5), 2L))
    val pStream = MemoryStream[(Long, Timestamp, Long)]
    val cStream = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.streamIntervalJoin(
      pStream.toDF().toDF("event_id", "ts", "user_id"),
      cStream.toDF().toDF("click_id", "ts", "user_id")
        .select(col("user_id"), col("ts"), col("click_id")),
      key = "user_id", tsCol = "ts", payload = Seq("click_id"),
      lookback = "20 minutes", watermark = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sj_out").start()
    try {
      pStream.addData(purchases); cStream.addData(clicks)
      q.processAllAvailable()
      val streamed = spark.table("sj_out")
        .select($"event_id", $"right_click_id").as[(Long, Long)].collect().toSet
      val batch = graft.ext.TemporalJoins.intervalJoin(
          purchases.toDF("event_id", "ts", "user_id"),
          clicks.toDF("click_id", "ts", "user_id"),
          "user_id", "ts", Seq("click_id"), lookbackMs = 20 * 60 * 1000)
        .select($"event_id", $"right_click_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched rows null-pad only after the watermark") {
    // the attribution-with-timeout shape: impressions LEFT OUTER join
    // clicks within 15 minutes — matches emit inline; an impression
    // with no click emits a null-padded row ONLY once both watermarks
    // pass its join window (state is then safely evictable)
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(Long, Timestamp)]
    val clk = MemoryStream[(Long, Timestamp)]
    val joined = imp.toDF().toDF("imp_id", "its")
      .withWatermark("its", "10 minutes")
      .join(clk.toDF().toDF("clk_id", "cts")
          .withWatermark("cts", "10 minutes"),
        expr("imp_id = clk_id AND " +
          "cts BETWEEN its AND its + INTERVAL 15 minutes"),
        "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("soj_out").start()
    try {
      imp.addData(Seq((1L, ts(0)), (2L, ts(1))))
      clk.addData(Seq((1L, ts(5))))
      q.processAllAvailable()
      // impression 2 is unmatched but its window is still open: no
      // null-padded row may exist yet
      assert(spark.table("soj_out").where($"clk_id".isNull).count() == 0)
      // push both watermarks far past impression 2's join window
      imp.addData(Seq((99L, ts(300)))); clk.addData(Seq((98L, ts(300))))
      q.processAllAvailable()
      imp.addData(Seq((97L, ts(301)))); clk.addData(Seq((96L, ts(301))))
      q.processAllAvailable()
      val outer = spark.table("soj_out").where($"clk_id".isNull)
        .select("imp_id").as[Long].collect().toSet
      assert(outer.contains(2L))
      val matched = spark.table("soj_out").where($"clk_id".isNotNull)
        .select("imp_id", "clk_id").as[(Long, Long)].collect().toSet
      assert(matched == Set((1L, 1L)))
    } finally q.stop()
  }

  test("stream dedup drops duplicate event ids within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    // dropDuplicatesWithinWatermark: bounded state (keys expire once
    // the watermark passes them), and retries with drifted timestamps
    // still dedup — here event 1 arrives twice with DIFFERENT ts
    val sdf = stream.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = sdf.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData(Seq((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 2.0)))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streamingSessions: append-mode session_window closes == batch sessionAgg on the same tape (r12 verdict #5)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.streamingSessions(sdf, gap = "20 minutes",
        watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      // sentinel events push the watermark far past every session's
      // end (+gap); two batches because the watermark computed at the
      // end of one batch drives the closes of the next
      val far = Timestamp.valueOf("2026-01-01 23:00:00")
      val far2 = Timestamp.valueOf("2026-01-01 23:30:00")
      stream.addData(Seq((98L, far, 999L, "click", 0.0, null)))
      q.processAllAvailable()
      stream.addData(Seq((99L, far2, 999L, "click", 0.0, null)))
      q.processAllAvailable()
      val streamed = spark.table("sess_out").where($"user_id" =!= 999L)
        .as[(String, String, Long, Long, Double)].collect().toSet
      val batch = EventStreams.sessionAgg(
          events.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          "20 minutes")
        .as[(String, String, Long, Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty,
        s"append-mode closes must equal the batch sessionizer: $streamed vs $batch")
    } finally q.stop()
  }

  test("session windows collapse bursts separated by the gap") {
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.sessionAgg(df, "20 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    // user 10: events at :00 and :05 -> one session of 2
    // user 11: events at :10 and :40 -> two sessions (gap > 20m)
    assert(out == Set((10L, 2L), (11L, 1L), (12L, 1L)))
  }

  test("sessionCloseEvents: closed sessions emit on in-batch gap AND on watermark timeout") {
    import graft.streaming.{ClosedSession, UserEvent}
    implicit val sqlCtx = spark.sqlContext
    val base = ts(0).getTime
    def tsm(min: Int): Timestamp = new Timestamp(base + min * 60000L)
    def usm(min: Int): Long = tsm(min).getTime * 1000L
    val stream = MemoryStream[UserEvent]
    val out = EventStreams.sessionCloseEvents(
      stream.toDS().withWatermark("ts", "1 minute").as[UserEvent],
      gapUs = 10L * 60 * 1000000) // 10-minute inactivity gap
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sess_close").start()
    try {
      // user 1: :00 and :05 form a session; :30 is past the gap, so
      // the first session closes INLINE within the batch fold
      stream.addData(UserEvent(1L, tsm(0), 1.0), UserEvent(1L, tsm(5), 1.0),
        UserEvent(1L, tsm(30), 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_close").as[ClosedSession].collect().toSet
        == Set(ClosedSession(1L, usm(0), usm(5), 2L)))
      // another user's much later events advance the watermark past
      // :30 + gap; the engine times user 1's open session out and the
      // close event is PUSHED without any further user-1 activity
      stream.addData(UserEvent(2L, tsm(120), 1.0))
      q.processAllAvailable()
      stream.addData(UserEvent(2L, tsm(121), 1.0))
      q.processAllAvailable()
      val closed = spark.table("sess_close").as[ClosedSession].collect().toSet
      assert(closed.contains(ClosedSession(1L, usm(30), usm(30), 1L)),
        s"expected the timed-out session close event, got $closed")
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{UserEvent, UserUpdate}
    val stream = MemoryStream[UserEvent]
    val q = EventStreams.runningUserTotals(stream.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try {
      stream.addData(UserEvent(1L, ts(0), 2.0), UserEvent(1L, ts(1), 3.0))
      q.processAllAvailable()
      stream.addData(UserEvent(1L, ts(2), 5.0), UserEvent(2L, ts(3), 1.0))
      q.processAllAvailable()
      val rows = spark.table("state_out").as[UserUpdate].collect()
      val latest1 = rows.filter(_.user_id == 1L).maxBy(_.count)
      assert(latest1.count == 3L && latest1.total == 10.0)
      assert(rows.filter(_.user_id == 2L).map(_.count).max == 1L)
    } finally q.stop()
  }

  test("file-source streaming over the real events parquet equals batch") {
    val src = "/root/testdata/sf0.001/events.parquet"
    assume(new java.io.File(src).exists())
    // the file stream source wants a directory
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    val q = EventStreams.streamTumblingAgg(spark, dir.toString, "10 minutes", "6 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_out")
        .as[(String, String, Long, Double)].collect().toSet
      val batch = EventStreams.tumblingAgg(
          EventStreams.readEvents(spark, "/root/testdata/sf0.001"), "6 hours")
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("file-source streaming adapts to a nanos-as-long events encoding") {
    // the OTHER physical encoding a foreign writer produces: ts as
    // epoch-nanos INT64. Synthesized from the real driver file so the
    // stream path (footer sniff -> explicit schema -> normalizeTs)
    // is exercised against the same rows the micros test streams.
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$src/events.parquet").exists())
    val batchDf = EventStreams.readEvents(spark, src)
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_stream")
    batchDf.withColumn("ts",
        (unix_micros($"ts") * 1000L).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val q = EventStreams.streamTumblingAgg(spark, dir.toString,
        "10 minutes", "6 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("nanos_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nanos_stream_out")
        .as[(String, String, Long, Double)].collect().toSet
      val batch = EventStreams.tumblingAgg(batchDf, "6 hours")
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("readEvents leaves the nanosAsLong session conf untouched on micros files") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    // current driver encoding is micros/NTZ: the legacy conf must be
    // restored (a library reader silently flipping a session-wide
    // legacy conf surprises co-resident readers)
    EventStreams.readEvents(spark, "/root/testdata/sf0.001").count()
    assert(spark.conf.getOption(key) == before)
  }

  test("streaming parquet sink round-trips the windowed aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.tumblingAgg(sdf.withWatermark("ts", "10 minutes"), "30 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .format("parquet").start(outDir)
    try {
      stream.addData(events)
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; advance the
      // watermark far enough to flush them all
      stream.addData((99L, Timestamp.valueOf("2026-01-01 13:00:00"), 1L, "view", 0.0, "{}"))
      q.processAllAvailable()
      val written = spark.read.parquet(outDir)
        .select("window_start", "event_type", "n_events")
        .as[(String, String, Long)].collect().toSet
      assert(written.contains(("2026-01-01 10:00:00", "click", 2L)))
      assert(written.contains(("2026-01-01 10:30:00", "view", 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment join equals batch, and the stream side never shuffles") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (11L, "silver")).toDF("user_id", "tier")
    val batch = EventStreams.enrichWithDim(
      events.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      dim, "user_id")
      .select("event_id", "tier").as[(Long, Option[String])].collect().toSet

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    stream.addData(events.map(e => (e._1, e._2, e._3, e._4, e._5, e._6)))
    val sdf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStreams.enrichWithDim(sdf, dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enriched")
      .as[(Long, Option[String])].collect().toSet
    assert(streamed == batch)
    assert(batch.contains((1L, Some("gold"))) && batch.contains((5L, None)))
  }

  test("corpus text ops run unchanged on a document stream (batch parity)") {
    // the training-data ingest shape: documents arrive as a stream and
    // get quality-scored + language-id'd with the SAME column
    // definitions the batch corpus queries use (map-only -> append
    // mode, no state)
    implicit val sqlCtx = spark.sqlContext
    val docRows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and the cat"),
      (2L, "el perro y la casa de la comida con los gatos"),
      (3L, "zz"),
      (4L, "the of and to in is that it for the of and to in is"))
    val batch = graft.ext.TextOps.qualityFeatures(docRows.toDF("doc_id", "text"))
      .withColumn("lang_pred", graft.ext.TextOps.langId(col("text")))
      .select("doc_id", "n_tokens", "quality_score", "lang_pred")
      .as[(Long, Long, Double, String)].collect().toSet

    val stream = MemoryStream[(Long, String)]
    stream.addData(docRows)
    val q = graft.ext.TextOps.qualityFeatures(
        stream.toDF().toDF("doc_id", "text"))
      .withColumn("lang_pred", graft.ext.TextOps.langId(col("text")))
      .select("doc_id", "n_tokens", "quality_score", "lang_pred")
      .writeStream.format("memory").queryName("docstream").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("docstream")
      .as[(Long, Long, Double, String)].collect().toSet
    assert(streamed == batch)
    assert(batch.exists { case (id, _, _, lang) => id == 1L && lang == "en" })
    assert(batch.exists { case (id, _, _, lang) => id == 2L && lang == "es" })
  }

  test("streaming CDC fold: per-batch applyChangelog == one-shot batch apply") {
    // the deploy shape for x123: a CDC stream folds into the standing
    // snapshot per micro-batch (foreachBatch — the apply involves an
    // anti join, so it rides foreachBatch like the LM/near-dup loops).
    // With batches arriving in ts order (the watermarked-CDC
    // guarantee), the incremental fold equals last-writer-wins over
    // the whole log — pinned here against the one-shot batch apply.
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val b1 = Seq((1L, 1, 0, "U", 11L), (4L, 1, 1, "I", 40L))
    val b2 = Seq((1L, 2, 0, "D", 0L), (2L, 2, 1, "U", 22L))
    var snap = base
    val stream = MemoryStream[(Long, Int, Int, String, Long)]
    val q = stream.toDF().toDF("k", "ts", "seq", "op", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        snap.synchronized {
          snap = graft.ext.Upserts.applyChangelog(snap, df, "k")
            .localCheckpoint()
        }
        ()
      }.start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = snap.as[(Long, Long)].collect().toMap
    val oneShot = graft.ext.Upserts.applyChangelog(base,
        (b1 ++ b2).toDF("k", "ts", "seq", "op", "v"), "k")
      .as[(Long, Long)].collect().toMap
    assert(streamed == oneShot)
    assert(streamed == Map(2L -> 22L, 3L -> 30L, 4L -> 40L))
  }

  test("streaming curation gate: pre-trained classifier + drift monitor per micro-batch") {
    // the deploy shape for the x54/x52 gates: weights are trained
    // offline (static, broadcast), each arriving micro-batch is
    // scored + drift-checked in foreachBatch — scoring involves a
    // per-doc aggregation, so it rides foreachBatch like the
    // streamingNearDup loop, not a stateful streaming agg
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((10L, "good fine nice", true),
      (11L, "bad awful poor", false),
      (12L, "good nice words", true),
      (13L, "bad poor words", false)).toDF("doc_id", "text", "y")
    val w = graft.ext.TextOps.trainLinearWeights(train, col("y"), minDf = 1)
      .localCheckpoint()
    val ref = Seq((100L, 30L), (101L, 50L), (102L, 230L))
      .toDF("doc_id", "n_chars") // reference n_chars histogram
    val b1 = Seq((0L, "good fine stuff", 10L), (1L, "bad awful stuff", 210L))
    val b2 = Seq((2L, "good nice fine", 15L), (3L, "bad poor awful", 420L))

    val scored = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Boolean)]
    val drifts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[(Long, String, Long)]
    val q = stream.toDF().toDF("doc_id", "text", "n_chars")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = graft.ext.TextOps.scoreLinear(df, w)
          .select("doc_id", "score_ppm", "predicted")
          .as[(Long, Long, Boolean)].collect()
        val tv = graft.ext.Profiling.tvDistancePpm(
          graft.ext.Profiling.histogramDrift(df, ref, "n_chars", 200L))
        scored.synchronized { scored ++= s; drifts += tv }
        ()
      }.start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()

    // scoring accumulates to the batch result over the union
    val batchScores = graft.ext.TextOps.scoreLinear(
        (b1 ++ b2).toDF("doc_id", "text", "n_chars"), w)
      .select("doc_id", "score_ppm", "predicted")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(scored.toSet == batchScores)
    assert(scored.map(r => r._1 -> r._3).toMap ==
      Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
    // each micro-batch's drift equals its batch-computed value
    val wantDrifts = Seq(b1, b2).map(b =>
      graft.ext.Profiling.tvDistancePpm(
        graft.ext.Profiling.histogramDrift(
          b.toDF("doc_id", "text", "n_chars"), ref, "n_chars", 200L)))
    assert(drifts.toSeq == wantDrifts)
    // batch 2 drifts harder (its 420-char doc has no reference mass)
    assert(drifts(1) > drifts(0))
  }

  test("streaming near-dup: per-epoch probe+append accumulates to the full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val day1 = Seq((0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"))
    val day2 = Seq((3L, "unrelated totally different words here now"),
      (4L, "one two three four five six seven")) // exact dup of day-1's 2
    graft.ext.Dedup.writeBandIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "streamspec_nd")
    val pairsDir = java.nio.file.Files.createTempDirectory("nd_pairs").toString
    val stream = MemoryStream[(Long, String)]
    val q = graft.ext.Dedup.streamingNearDup("streamspec_nd",
      stream.toDF().toDF("doc_id", "text"), pairsDir, threshold = 0.5)
    stream.addData(day1); q.processAllAvailable()
    stream.addData(day2); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(pairsDir)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // the one-shot rebuild through the same machinery: everything
    // probed against an empty index degenerates to the all-pairs set
    graft.ext.Dedup.writeBandIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "streamspec_nd_f")
    val full = graft.ext.Dedup.probeBandIndex("streamspec_nd_f",
        (day1 ++ day2).toDF("doc_id", "text"), threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == full)
    assert(streamed.contains((0L, 1L, 1.0))) // intra-epoch pair
    // CROSS-epoch pair: day 2's doc 4 duplicates day 1's doc 2, which
    // it can only see through the index append — proves epoch 1's
    // batch was folded in before epoch 2 probed
    assert(streamed.contains((2L, 4L, 1.0)))
  }

  test("streaming near-dup survives a restart: resumed query continues, nothing re-emitted") {
    val srcDir = java.nio.file.Files.createTempDirectory("nd_src").toString
    val pairsDir = java.nio.file.Files.createTempDirectory("nd_rpairs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt").toString
    val day1 = Seq((0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"))
    val day2 = Seq((3L, "unrelated totally different words here now"),
      (4L, "one two three four five six seven"))
    graft.ext.Dedup.writeBandIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "streamspec_nd_r")
    def startQ() = graft.ext.Dedup.streamingNearDup("streamspec_nd_r",
      spark.readStream.schema("doc_id LONG, text STRING").parquet(srcDir),
      pairsDir, threshold = 0.5, checkpointDir = Some(ckpt))
    day1.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    day2.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    // a NEW query on the same checkpoint resumes past day 1's offsets
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    val emitted = spark.read.parquet(pairsDir)
    // cross-restart pair: day 2's doc 4 sees day 1's doc 2 only
    // through the index the pre-restart query appended
    val pairs = emitted.select("a", "b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.contains((2L, 4L, 1.0)))
    assert(pairs.contains((0L, 1L, 1.0)))
    // nothing re-emitted, nothing double-appended: every pair appears
    // in exactly one epoch, with exactly one row
    val dupes = emitted.groupBy("a", "b").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0L)
  }

  test("streaming embedding near-dup: per-epoch probe+append == one-shot probe") {
    // the vector-space sibling of the streamingNearDup pin (r9 verdict
    // #6): each epoch probes the persisted writeBucketed layout, then
    // folds in — accumulated pairs must equal a single probe of every
    // batch at once against a fresh copy of the seed layout
    implicit val sqlCtx = spark.sqlContext
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val seed = Seq((0L, vec(1, 0, 0, 0)), (1L, vec(0, 1, 0, 0)),
      (2L, vec(0, 0, 0.5, 0.5)))
    val day1 = Seq((10L, vec(1, 0, 0, 0)),   // dup of seed 0
      (11L, vec(0, 0, 1, 0)))
    val day2 = Seq((20L, vec(0, 0, 1, 0)),   // dup of day-1's 11
      (21L, vec(0, 1, 0.01, 0)))             // near-dup of seed 1
    val idx = java.nio.file.Files.createTempDirectory("emb_idx").toString
    graft.ext.Similarity.writeBucketed(seed.toDF("vec_id", "embedding"),
      idx, planes = 4, portable = true)
    val pairsDir = java.nio.file.Files.createTempDirectory("emb_pairs").toString
    val stream = MemoryStream[(Long, Array[Float])]
    val q = graft.ext.Similarity.streamingEmbeddingNearDup(idx,
      stream.toDF().toDF("vec_id", "embedding"), pairsDir,
      threshold = 0.9, planes = 4)
    try {
      stream.addData(day1); q.processAllAvailable()
      stream.addData(day2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(pairsDir)
      .select("a", "b", "cosine").as[(Long, Long, Double)].collect().toSet
    val idx2 = java.nio.file.Files.createTempDirectory("emb_idx2").toString
    graft.ext.Similarity.writeBucketed(seed.toDF("vec_id", "embedding"),
      idx2, planes = 4, portable = true)
    val full = graft.ext.Similarity.probeBucketedNearDup(spark, idx2,
        (day1 ++ day2).toDF("vec_id", "embedding"), 0.9, planes = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == full)
    assert(streamed.contains((0L, 10L, 1.0)))  // batch × seed corpus
    // CROSS-epoch pair: day 2's 20 duplicates day 1's 11, visible only
    // because epoch 1's batch was appended before epoch 2 probed
    assert(streamed.contains((11L, 20L, 1.0)))
    // the near-dup (21 vs seed 1) clears 0.9 but is not exactly 1
    assert(streamed.exists { case (a, b, c) =>
      a == 1L && b == 21L && c >= 0.9 && c < 1.0 })
  }

  test("streaming index ingest: accumulated micro-batches == one-shot build (r10 verdict #3)") {
    implicit val sqlCtx = spark.sqlContext
    val day1 = Seq((1L, "data data data hash"), (2L, "data hash hash"))
    val day2 = Seq((3L, "unrelated words only"), (4L, "data"))
    val day3 = Seq((5L, "hash batch data data"), (6L, "batch batch"))
    graft.ext.TextOps.writeInvertedIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "streamspec_idx",
      buckets = 2)
    val stream = MemoryStream[(Long, String)]
    val q = graft.ext.TextOps.streamingIndexIngest("streamspec_idx",
      stream.toDF().toDF("doc_id", "text"))
    try {
      stream.addData(day1); q.processAllAvailable()
      stream.addData(day2); q.processAllAvailable()
      stream.addData(day3); q.processAllAvailable()
    } finally q.stop()
    graft.ext.TextOps.writeInvertedIndex(
      (day1 ++ day2 ++ day3).toDF("doc_id", "text"), "streamspec_idx_f",
      buckets = 2)
    for (terms <- Seq(Seq("data", "hash"), Seq("batch"))) {
      val streamed = graft.ext.TextOps.searchIndexBm25(spark,
        "streamspec_idx", terms, 10).as[(Long, Long, Long)].collect().toList
      val oneShot = graft.ext.TextOps.searchIndexBm25(spark,
        "streamspec_idx_f", terms, 10).as[(Long, Long, Long)].collect().toList
      assert(streamed == oneShot, s"terms=$terms")
    }
  }

  test("streaming index ingest: a replayed epoch applies exactly once") {
    // foreachBatch is at-least-once: a restart can re-deliver the last
    // epoch. The ${name}_epochs sidecar must make the re-delivery a
    // no-op — same search result after a deliberate double-ingest.
    graft.ext.TextOps.writeInvertedIndex(
      Seq((1L, "data hash")).toDF("doc_id", "text"), "streamspec_idxr",
      buckets = 2)
    val batch = Seq((2L, "data data batch")).toDF("doc_id", "text")
    graft.ext.TextOps.ingestIndexBatch(batch, "streamspec_idxr", epoch = 0L)
    val once = graft.ext.TextOps.searchIndexBm25(spark, "streamspec_idxr",
      Seq("data", "batch"), 10).as[(Long, Long, Long)].collect().toList
    graft.ext.TextOps.ingestIndexBatch(batch, "streamspec_idxr", epoch = 0L)
    val twice = graft.ext.TextOps.searchIndexBm25(spark, "streamspec_idxr",
      Seq("data", "batch"), 10).as[(Long, Long, Long)].collect().toList
    assert(once == twice, "replayed epoch must not double-count postings")
    // a NEW epoch still folds in
    graft.ext.TextOps.ingestIndexBatch(
      Seq((3L, "batch batch")).toDF("doc_id", "text"), "streamspec_idxr",
      epoch = 1L)
    val after = graft.ext.TextOps.searchIndexBm25(spark, "streamspec_idxr",
      Seq("batch"), 10).as[(Long, Long, Long)].collect().toList
    assert(after.map(_._1).contains(3L))
  }

  test("deleteIndexDocs: replay of a TORN delete completes the df/stats retraction (r12 advice)") {
    import org.apache.spark.sql.functions.{col, lit, sum, xxhash64, coalesce}
    val all = Seq((1L, "data data hash"), (2L, "data hash hash batch"),
      (3L, "batch batch data"), (4L, "data hash"))
    graft.ext.TextOps.writeInvertedIndex(all.toDF("doc_id", "text"),
      "streamspec_torn", buckets = 2)
    val dels = Seq(2L, 4L).toDF("doc_id")
    // simulate the tear: the tombstones committed (stamped with the
    // batch hash deleteIndexDocs will recompute), but the crash
    // landed before either retraction write — the exact window the
    // old tombstone-only guard turned into permanent score drift
    val batchHash = dels
      .agg(coalesce(sum(xxhash64(col("doc_id")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")))
      .head().getDecimal(0).toBigInteger
      .mod(java.math.BigInteger.valueOf(Long.MaxValue)).longValue()
    // orphaned managed locations from a previous test JVM (files
    // survive, the in-memory catalog does not) block CREATE TABLE AS
    for (t <- Seq("streamspec_torn_tombstones", "streamspec_torn_delmarks")
         if !spark.catalog.tableExists(t)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    dels.select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("batch_hash", lit(batchHash))
      .write.format("parquet").saveAsTable("streamspec_torn_tombstones")
    // docs are dark already, but df/stats still price the full corpus
    // (the torn state); the REPLAY must repair, not short-circuit
    graft.ext.TextOps.deleteIndexDocs(spark, "streamspec_torn", dels)
    graft.ext.TextOps.writeInvertedIndex(
      all.filterNot(d => Set(2L, 4L)(d._1)).toDF("doc_id", "text"),
      "streamspec_torn_rb", buckets = 2)
    def res(name: String) = graft.ext.TextOps.searchIndexBm25(spark, name,
      Seq("data", "batch"), 10).as[(Long, Long, Long)].collect().toList
    assert(res("streamspec_torn") == res("streamspec_torn_rb"),
      "replayed torn delete must complete the df/stats retraction")
    // and a SECOND replay of the now-complete batch is a no-op
    val once = res("streamspec_torn")
    graft.ext.TextOps.deleteIndexDocs(spark, "streamspec_torn", dels)
    assert(res("streamspec_torn") == once,
      "replay after repair must not double-retract")
  }

  test("compactInvertedIndex: plain replay after a DROP-then-crash heals the stranded table (r13 recovery-first)") {
    import org.apache.spark.sql.functions.col
    val all = Seq((1L, "data data hash"), (2L, "data hash hash batch"),
      (3L, "batch batch data"), (4L, "data hash"))
    graft.ext.TextOps.writeInvertedIndex(all.toDF("doc_id", "text"),
      "streamspec_swapcrash", buckets = 2)
    graft.ext.TextOps.deleteIndexDocs(spark, "streamspec_swapcrash",
      Seq(2L).toDF("doc_id"))
    // simulate window (b) of the POSTINGS swap inside a crashed
    // compaction: the canonical postings fully staged in the
    // __compacting table, the live postings table DROPped, crash
    // before the RENAME. Tombstones still exist (they drop last).
    // The compaction reads postings BEFORE its first swap, so only
    // the entry-level recovery can heal this state.
    spark.table("streamspec_swapcrash_postings")
      .join(spark.table("streamspec_swapcrash_tombstones")
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .write.bucketBy(2, "term").sortBy("term").format("parquet")
      .saveAsTable("streamspec_swapcrash_postings__compacting")
    spark.sql("DROP TABLE streamspec_swapcrash_postings")
    // a PLAIN replay of the compaction must heal (ALTER RENAME keeps
    // the bucket spec) and then complete the canonical rewrite
    graft.ext.TextOps.compactInvertedIndex(spark, "streamspec_swapcrash")
    assert(!spark.catalog.tableExists(
      "streamspec_swapcrash_postings__compacting"))
    assert(!spark.catalog.tableExists("streamspec_swapcrash_tombstones"))
    // bucket spec survived the recovery rename
    val nb = spark.sql("DESCRIBE FORMATTED streamspec_swapcrash_postings")
      .filter(col("col_name") === "Num Buckets")
      .select("data_type").head().getString(0).trim.toInt
    assert(nb == 2, "recovery must preserve the bucket spec")
    graft.ext.TextOps.writeInvertedIndex(
      all.filterNot(_._1 == 2L).toDF("doc_id", "text"),
      "streamspec_swapcrash_rb", buckets = 2)
    def res(name: String) = graft.ext.TextOps.searchIndexBm25(spark, name,
      Seq("data", "batch"), 10).as[(Long, Long, Long)].collect().toList
    assert(res("streamspec_swapcrash") == res("streamspec_swapcrash_rb"),
      "healed + compacted index must equal rebuild-on-remaining")
  }

  test("deleteIndexDocs: delete == rebuild-on-remaining; replayed delete retracts exactly once (r11 verdict #2)") {
    val all = Seq((1L, "data data hash"), (2L, "data hash hash batch"),
      (3L, "batch batch data"), (4L, "data hash"))
    graft.ext.TextOps.writeInvertedIndex(all.toDF("doc_id", "text"),
      "streamspec_del", buckets = 2)
    val dels = Seq(2L, 4L).toDF("doc_id")
    graft.ext.TextOps.deleteIndexDocs(spark, "streamspec_del", dels)
    graft.ext.TextOps.writeInvertedIndex(
      all.filterNot(d => Set(2L, 4L)(d._1)).toDF("doc_id", "text"),
      "streamspec_del_rb", buckets = 2)
    def res(name: String) = graft.ext.TextOps.searchIndexBm25(spark, name,
      Seq("data", "batch"), 10).as[(Long, Long, Long)].collect().toList
    val once = res("streamspec_del")
    assert(once == res("streamspec_del_rb"),
      "delete-then-search must equal rebuild-on-remaining (df AND stats)")
    // at-least-once delivery: the same delete batch replayed must not
    // double-retract the df/stats segments (tombstone-keyed dedup)
    graft.ext.TextOps.deleteIndexDocs(spark, "streamspec_del", dels)
    assert(res("streamspec_del") == once,
      "replayed delete must be a no-op")
    // compaction drops the tombstoned rows physically; answers hold
    graft.ext.TextOps.compactInvertedIndex(spark, "streamspec_del")
    assert(res("streamspec_del") == once,
      "compaction must change bytes, not answers")
    assert(!spark.catalog.tableExists("streamspec_del_tombstones"),
      "compaction must clear the tombstone table")
    // the lifecycle keeps going: a post-compaction delete retracts
    graft.ext.TextOps.deleteIndexDocs(spark, "streamspec_del",
      Seq(3L).toDF("doc_id"))
    graft.ext.TextOps.writeInvertedIndex(
      Seq((1L, "data data hash")).toDF("doc_id", "text"),
      "streamspec_del_rb2", buckets = 2)
    assert(res("streamspec_del") == res("streamspec_del_rb2"))
  }

  test("streamingIndexDeletes: streamed retraction batches == one batch delete; search == rebuild-on-remaining (r12)") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq((1L, "data data hash"), (2L, "data hash hash batch"),
      (3L, "batch batch data"), (4L, "data hash"), (5L, "data batch"))
    graft.ext.TextOps.writeInvertedIndex(all.toDF("doc_id", "text"),
      "streamspec_sdel", buckets = 2)
    val stream = MemoryStream[Long]
    val q = graft.ext.TextOps.streamingIndexDeletes("streamspec_sdel",
      stream.toDF().toDF("doc_id"))
    try {
      stream.addData(2L); q.processAllAvailable()
      stream.addData(4L, 2L); q.processAllAvailable() // 2 re-delivered
    } finally q.stop()
    graft.ext.TextOps.writeInvertedIndex(
      all.filterNot(d => Set(2L, 4L)(d._1)).toDF("doc_id", "text"),
      "streamspec_sdel_rb", buckets = 2)
    def res(name: String) = graft.ext.TextOps.searchIndexBm25(spark, name,
      Seq("data", "batch"), 10).as[(Long, Long, Long)].collect().toList
    assert(res("streamspec_sdel") == res("streamspec_sdel_rb"),
      "streamed deletes must equal the rebuild on the remaining corpus")
  }

  test("streamingRetire: streamed retirement batches + replayed epoch == one-shot retirement (r13 verdict #7)") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, "a b", 0), (2L, "c", 0), (3L, "d e f", 1),
      (4L, "g", 1), (5L, "h i", 2))
    val base = java.nio.file.Files
      .createTempDirectory("streamspec_retire").toString
    val streamed = s"$base/streamed"
    val oneshot = s"$base/oneshot"
    for (p <- Seq(streamed, oneshot))
      docs.toDF("doc_id", "text", "shard")
        .write.mode("overwrite").partitionBy("shard").parquet(p)
    val stream = MemoryStream[Long]
    val q = graft.ext.Sampling.streamingRetire(streamed,
      stream.toDF().toDF("doc_id"), "doc_id", "text")
    try {
      stream.addData(2L); q.processAllAvailable()
      stream.addData(4L, 2L); q.processAllAvailable() // 2 re-delivered
      stream.addData(3L); q.processAllAvailable()     // empties shard 1
    } finally q.stop()
    val one = graft.ext.Sampling.retireFromShards(spark, oneshot,
        Seq(2L, 3L, 4L).toDF("doc_id"), "doc_id", "text")
      .select("shard", "n_rows", "n_tokens", "checksum")
      .as[(Int, Long, Long, Long)].collect().toSet
    val manifest = graft.ext.Sampling.retireFromShards(spark, streamed,
        spark.range(0).select(col("id").as("doc_id")), "doc_id", "text")
      .select("shard", "n_rows", "n_tokens", "checksum")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(manifest == one,
      "streamed retirement must hash-match the one-shot manifest")
    assert(spark.read.parquet(streamed).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 5L))
    assert(!new java.io.File(s"$streamed/shard=1").exists,
      "a shard emptied by a streamed batch must be gone")
  }

  test("deleteBinaryIndex: replay is a no-op; compaction clears tombstones with the probe unchanged (r11 verdict #2)") {
    val emb = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(8)(d => (math.sin(i * 7 + d) * 4).toFloat)))
      .toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("binidx_del").toString
    graft.ext.Clustering.writeBinaryIndex(emb, path, dims = 8)
    val dels = (40 until 50).map(_.toLong).toDF("vec_id")
    graft.ext.Clustering.deleteBinaryIndex(spark, path, dels)
    def probe() = graft.ext.Clustering.probeBinaryIndex(spark, path, emb,
        emb.where(col("vec_id") < 3), dims = 8, rerankR = 20, topK = 5)
      .as[(Long, Long, Long, Int)].collect().toList
    val once = probe()
    assert(once.nonEmpty && !once.exists(r => r._2 >= 40 && r._2 < 50),
      "tombstoned vectors must never surface as neighbors")
    graft.ext.Clustering.deleteBinaryIndex(spark, path, dels)
    assert(probe() == once, "replayed delete must be a no-op")
    graft.ext.Clustering.compactBinaryIndex(spark, path)
    assert(probe() == once, "compaction must change bytes, not answers")
    val tombs = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    assert(!tombs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(tombs), "compaction must clear the tombstone sidecar")
  }

  test("multiTouchAttribution: maxTouches valve — pass-through under the cap, latest-N when binding (r11 verdict #3)") {
    val ev = Seq(
      (1L, ts(0), 10L, "click", 1.0),
      (2L, ts(5), 10L, "click", 2.0),
      (3L, ts(10), 10L, "purchase", 9.0),
      (6L, ts(30), 12L, "click", 1.0),
      (7L, ts(31), 12L, "click", 1.0),
      (8L, ts(32), 12L, "click", 1.0),
      (9L, ts(40), 12L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(cap: Int) = EventStreams.multiTouchAttribution(ev, "click",
        "purchase", lookbackMs = 3600L * 1000, maxTouches = cap)
      .select("conv_id", "touch_id", "position", "n_touches",
        "credit_linear_ppm", "credit_position_ppm", "credit_last_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val uncapped = EventStreams.multiTouchAttribution(ev, "click",
        "purchase", lookbackMs = 3600L * 1000)
      .select("conv_id", "touch_id", "position", "n_touches",
        "credit_linear_ppm", "credit_position_ppm", "credit_last_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // max fan-out in the fixture is 3 touches: cap 3 must pass through
    assert(run(3) == uncapped)
    // cap 2 binds for conv 9: the LATEST two clicks (7, 8) survive,
    // positions/credits recomputed on the capped universe
    val capped = run(2)
    assert(capped.filter(_._1 == 9L) == Set(
      (9L, 7L, 1L, 2L, 500000L, 500000L, 0L),
      (9L, 8L, 2L, 2L, 500000L, 500000L, 1000000L)))
    // conv 3 (2 touches) is untouched by the cap
    assert(capped.filter(_._1 == 3L) == uncapped.filter(_._1 == 3L))
  }

  test("appendBucketedIdempotent: a replayed epoch folds into the ANN layout exactly once (r10 advice)") {
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val seed = Seq((0L, vec(1, 0, 0, 0)), (1L, vec(0, 1, 0, 0)))
    val idx = java.nio.file.Files.createTempDirectory("emb_idem").toString
    graft.ext.Similarity.writeBucketed(seed.toDF("vec_id", "embedding"),
      idx, planes = 4, portable = true)
    val batch = Seq((10L, vec(1, 0, 0, 0)), (11L, vec(0, 0, 1, 0)))
      .toDF("vec_id", "embedding")
    graft.ext.Similarity.appendBucketedIdempotent(spark, idx, batch,
      epoch = 7L, planes = 4)
    graft.ext.Similarity.appendBucketedIdempotent(spark, idx, batch,
      epoch = 7L, planes = 4)
    val ids = spark.read.parquet(idx).groupBy("vec_id").count()
      .as[(Long, Long)].collect().toMap
    assert(ids == Map(0L -> 1L, 1L -> 1L, 10L -> 1L, 11L -> 1L),
      s"every vector exactly once, got $ids")
    // a fresh epoch still appends
    graft.ext.Similarity.appendBucketedIdempotent(spark, idx,
      Seq((12L, vec(0, 1, 0.5, 0))).toDF("vec_id", "embedding"),
      epoch = 8L, planes = 4)
    assert(spark.read.parquet(idx).count() == 5L)
  }

  test("streamingIvfPq: per-epoch probe+append == the batch lifecycle; replay appends once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Clustering
    def vec(i: Int): Array[Float] =
      Array.tabulate(8)(d => (math.sin(i * 3 + d) * 5).toFloat)
    val corpus = (0 until 40).map(i => (i.toLong, vec(i)))
    val day1 = Seq((100L, vec(1)), (101L, vec(25)))
    val day2 = Seq((200L, vec(100)), (201L, vec(1)))
    // streaming leg
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_s").toString
    Clustering.writeIvfPq(corpus.toDF("vec_id", "embedding"), idx,
      dims = 8, cells = 2, m = 2, k = 4, iters = 1)
    val resDir = java.nio.file.Files.createTempDirectory("ivfpq_r").toString
    val stream = MemoryStream[(Long, Array[Float])]
    // topK covers the whole probed cell so the cross-epoch duplicate
    // cannot be displaced by code-collision ties
    val q = Clustering.streamingIvfPq(idx,
      stream.toDF().toDF("vec_id", "embedding"), resDir,
      dims = 8, nProbe = 1, m = 2, topK = 50)
    try {
      stream.addData(day1); q.processAllAvailable()
      stream.addData(day2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(resDir)
      .select("query_id", "neighbor_id", "adc_d2", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // batch lifecycle twin on a fresh copy of the layout
    val idx2 = java.nio.file.Files.createTempDirectory("ivfpq_s2").toString
    Clustering.writeIvfPq(corpus.toDF("vec_id", "embedding"), idx2,
      dims = 8, cells = 2, m = 2, k = 4, iters = 1)
    val p1 = Clustering.probeIvfPq(spark, idx2, day1.toDF("vec_id", "embedding"),
      dims = 8, nProbe = 1, m = 2, topK = 50)
      .as[(Long, Long, Long, Int)].collect().toSet
    Clustering.appendIvfPq(spark, idx2, day1.toDF("vec_id", "embedding"),
      dims = 8, m = 2)
    val p2 = Clustering.probeIvfPq(spark, idx2, day2.toDF("vec_id", "embedding"),
      dims = 8, nProbe = 1, m = 2, topK = 50)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(streamed == (p1 ++ p2))
    // cross-epoch retrieval: day 2's 201 duplicates day 1's 100 (both
    // vec(1)) — visible only because epoch 1's batch was appended
    // before epoch 2 probed (ADC distance = the query's own
    // quantization distortion, ties with corpus vec 1)
    assert(streamed.exists { case (qid, nb, _, _) =>
      qid == 201L && nb == 100L })
    // replayed epoch: re-running the epoch-1 append through the
    // idempotent protocol leaves the layout unchanged
    val before = spark.read.parquet(s"$idx/codes").count()
    graft.sources.IdempotentAppend.append(spark, s"$idx/codes",
      spark.read.parquet(s"$idx2/codes").limit(1), "cell", 0L)
    assert(spark.read.parquet(s"$idx/codes").count() == before)
  }

  test("streamingBinaryIndex: per-epoch probe+append == the batch lifecycle; replay appends once (r11 verdict #6)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Clustering
    def vec(i: Int): Array[Float] =
      Array.tabulate(8)(d => (math.sin(i * 3 + d) * 5).toFloat)
    val corpus = (0 until 40).map(i => (i.toLong, vec(i)))
    val day1 = Seq((100L, vec(1)), (101L, vec(25)))
    val day2 = Seq((200L, vec(100)), (201L, vec(1)))
    val idx = java.nio.file.Files.createTempDirectory("bin_s").toString
    val vecDir = java.nio.file.Files.createTempDirectory("bin_v").toString
    Clustering.writeBinaryIndex(corpus.toDF("vec_id", "embedding"), idx,
      dims = 8)
    corpus.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(vecDir)
    val resDir = java.nio.file.Files.createTempDirectory("bin_r").toString
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Clustering.streamingBinaryIndex(idx,
      stream.toDF().toDF("vec_id", "embedding"), resDir, vecDir,
      dims = 8, rerankR = 30, topK = 30)
    try {
      stream.addData(day1); q.processAllAvailable()
      stream.addData(day2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(resDir)
      .select("query_id", "neighbor_id", "d2", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // batch lifecycle twin on a fresh copy of the layout
    val idx2 = java.nio.file.Files.createTempDirectory("bin_s2").toString
    Clustering.writeBinaryIndex(corpus.toDF("vec_id", "embedding"), idx2,
      dims = 8)
    val p1 = Clustering.probeBinaryIndex(spark, idx2,
        corpus.toDF("vec_id", "embedding"),
        day1.toDF("vec_id", "embedding"), dims = 8, rerankR = 30,
        topK = 30)
      .as[(Long, Long, Long, Int)].collect().toSet
    Clustering.appendBinaryIndex(spark, idx2,
      day1.toDF("vec_id", "embedding"), dims = 8)
    val p2 = Clustering.probeBinaryIndex(spark, idx2,
        (corpus ++ day1).toDF("vec_id", "embedding"),
        day2.toDF("vec_id", "embedding"), dims = 8, rerankR = 30,
        topK = 30)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(streamed == (p1 ++ p2))
    // cross-epoch retrieval: day 2's 201 duplicates day 1's 100 (both
    // vec(1), d2 = 0) — visible only because epoch 1's batch was
    // appended before epoch 2 probed
    assert(streamed.exists { case (qid, nb, d2, _) =>
      qid == 201L && nb == 100L && d2 == 0L })
    // replayed epoch: the marker short-circuits before any append
    val before = spark.read.parquet(s"$idx/codes").count()
    Clustering.ingestBinaryBatch(spark, idx,
      day1.toDF("vec_id", "embedding"), dims = 8, epoch = 0L)
    assert(spark.read.parquet(s"$idx/codes").count() == before,
      "replayed epoch must not re-append codes")
  }

  test("streaming expectations gate: merged per-epoch states == one-shot card") {
    implicit val sqlCtx = spark.sqlContext
    val rules = Seq(
      "positive" -> (col("v") > 0L),
      "small" -> (col("v") < 100L))
    val day1 = Seq((1L, 5L), (2L, -3L), (3L, 200L))
    val day2 = Seq((4L, 7L), (5L, 50L))
    val stateDir = java.nio.file.Files.createTempDirectory("exp_state")
      .toString
    val stream = MemoryStream[(Long, Long)]
    val q = graft.ext.Profiling.streamingExpectationsGate(
      stream.toDF().toDF("id", "v"), rules, stateDir)
    try {
      stream.addData(day1); q.processAllAvailable()
      stream.addData(day2); q.processAllAvailable()
    } finally q.stop()
    val merged = graft.ext.Profiling.mergeExpectations(
        spark.read.parquet(stateDir))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    val oneShot = graft.ext.Profiling.expectationsCard(
        (day1 ++ day2).toDF("id", "v"), rules)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(merged == oneShot)
    // a replayed epoch overwrites its own state dir — card unchanged
    graft.ext.Profiling.expectationsState(day2.toDF("id", "v"), rules)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$stateDir/epoch=1")
    val replayed = graft.ext.Profiling.mergeExpectations(
        spark.read.parquet(stateDir))
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(replayed == oneShot)
  }

  test("multiTouchAttribution: ppm credits sum to exactly 1e6; last-touch column degenerates to q57's kernel") {
    // user 10: clicks at :00 and :05, purchase at :10 -> 2 touches
    // user 11: view only -> purchase (if any) unattributed
    val ev = Seq(
      (1L, ts(0), 10L, "click", 1.0),
      (2L, ts(5), 10L, "click", 2.0),
      (3L, ts(10), 10L, "purchase", 9.0),
      (4L, ts(1), 11L, "view", 3.0),
      (5L, ts(20), 11L, "purchase", 8.0),
      (6L, ts(30), 12L, "click", 1.0),
      (7L, ts(31), 12L, "click", 1.0),
      (8L, ts(32), 12L, "click", 1.0),
      (9L, ts(40), 12L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.multiTouchAttribution(ev, "click", "purchase",
      lookbackMs = 3600L * 1000)
    // per-conversion sums are EXACTLY 10^6 for every credit model
    val sums = out.filter(col("touch_id").isNotNull)
      .groupBy("conv_id")
      .agg(sum("credit_linear_ppm").as("l"), sum("credit_position_ppm").as("p"),
        sum("credit_last_ppm").as("z"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sums == Set((3L, 1000000L, 1000000L, 1000000L),
      (9L, 1000000L, 1000000L, 1000000L)))
    // 3 touches for conv 9: linear 333334/333333/333333 (largest
    // remainder to the earliest position); U-shape 400000/200000/400000
    val c9 = out.filter(col("conv_id") === 9L)
      .orderBy("position")
      .select("credit_linear_ppm", "credit_position_ppm")
      .as[(Long, Long)].collect().toList
    assert(c9 == List((333334L, 400000L), (333333L, 200000L),
      (333333L, 400000L)))
    // unattributed purchase survives with NULL touch and 0 touches
    val u = out.filter(col("conv_id") === 5L)
      .select(col("touch_id").isNull, col("n_touches"))
      .as[(Boolean, Long)].collect().toList
    assert(u == List((true, 0L)))
    // last-touch degenerate case == lastTouchAttribution
    val lt = EventStreams.lastTouchAttribution(ev, "click", "purchase",
        3600L * 1000)
      .filter(col("attributed"))
      .select("conv_id", "touch_id").as[(Long, Long)].collect().toSet
    val mt = out.filter(col("credit_last_ppm") === 1000000L)
      .select("conv_id", "touch_id").as[(Long, Long)].collect().toSet
    assert(mt == lt)
  }

  test("lastTouchAttribution: latest in-window click wins, ties by max id") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 100L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 100L, "click", 0.0, "{}"), // ts tie w/ 2
      (4L, ts("2024-01-01 12:00:00"), 100L, "purchase", 1.0, "{}"),
      (5L, ts("2024-01-05 12:00:00"), 100L, "purchase", 1.0, "{}"),
      (6L, ts("2024-02-01 12:00:00"), 100L, "purchase", 1.0, "{}"), // > 7d
      (7L, ts("2024-01-01 12:00:00"), 200L, "purchase", 1.0, "{}")) // no click
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.lastTouchAttribution(
        ev, "click", "purchase", 7L * 24 * 3600 * 1000)
      .select("conv_id", "touch_id", "attributed")
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(4L) == ((Some(3L), true)))  // same-ts tie: max event_id
    assert(out(5L) == ((Some(3L), true)))  // 4 days back, inside 7d
    assert(out(6L) == ((None, false)))     // click exists but stale
    assert(out(7L) == ((None, false)))     // never touched
  }

  test("json props extraction (get_json_object path)") {
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.withProps(df, "k")
      .select("event_id", "prop_k").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(1L) && out(5L).isEmpty)
  }

  test("streaming KMV distinct state accumulates to the batch kmvDistinct") {
    implicit val sqlCtx = spark.sqlContext
    // group "a": 10 distinct values (over k=4 -> estimator path);
    // group "b": 2 distinct (exact path); batch 2 repeats some of
    // batch 1 (the sketch must dedup across batches)
    val b1 = (0 until 6).map(i => ("a", s"v$i")) ++ Seq(("b", "x"))
    val b2 = (3 until 10).map(i => ("a", s"v$i")) ++ Seq(("b", "y"), ("b", "x"))
    val stream = MemoryStream[(String, String)]
    val q = EventStreams.streamingDistincts(
        stream.toDF().toDF("g", "v"), "g", "v", k = 4)
      .toDF("g", "n_k", "distinct_est")
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_out").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // latest update per group (highest n_k within a group is the
      // newest state — the sketch only grows)
      val streamed = spark.table("kmv_out")
        .groupBy("g").agg(max(struct(col("n_k"), col("distinct_est"))).as("m"))
        .select(col("g"), col("m.n_k"), col("m.distinct_est"))
        .as[(String, Long, Long)].collect()
        .map { case (g, n, e) => g -> ((n, e)) }.toMap
      val batch = graft.ext.Profiling.kmvDistinct(
          (b1 ++ b2).toDF("g", "v"), "g", "v", k = 4)
        .as[(String, Long, Long)].collect()
        .map { case (g, n, e) => g -> ((n, e)) }.toMap
      assert(streamed == batch)
      assert(batch("b")._1 == 2L && batch("b")._2 == 2L)  // exact path
      assert(batch("a")._1 == 4L)                          // at capacity
    } finally q.stop()
  }

  test("transition matrix: hand-computed counts and integer ppm shares") {
    // one user, sequence a b a c a b -> (a,b):2 (a,c):1 (b,a):1 (c,a):1
    val df = Seq(
        (1L, ts(0), 7L, "a", 0.0, "{}"), (2L, ts(1), 7L, "b", 0.0, "{}"),
        (3L, ts(2), 7L, "a", 0.0, "{}"), (4L, ts(3), 7L, "c", 0.0, "{}"),
        (5L, ts(4), 7L, "a", 0.0, "{}"), (6L, ts(5), 7L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.transitionMatrix(df)
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 2L, 666666L), ("a", "c", 1L, 333333L),
      ("b", "a", 1L, 1000000L), ("c", "a", 1L, 1000000L)))
  }

  test("transition matrix orders ties by event_id, not arrival order") {
    // same timestamp: event_id decides b-then-c, so a->b->c->d
    val t0 = ts(0)
    val df = Seq(
        (1L, t0, 7L, "a", 0.0, "{}"), (3L, t0, 7L, "c", 0.0, "{}"),
        (2L, t0, 7L, "b", 0.0, "{}"), (4L, t0, 7L, "d", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.transitionMatrix(df)
      .select("src_type", "dst_type").as[(String, String)].collect().toSet
    assert(out == Set(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("daily anomalies: spike = n*t_days > 2*t_sum over the filled grid") {
    def day(d: Int): Timestamp = Timestamp.valueOf(f"2026-01-$d%02d 12:00:00")
    val rows =
      (1 to 8).map(d => (d.toLong, day(d), 1L, "a", 0.0, "{}")) ++     // a: 1/day
      (90 to 94).map(i => (i.toLong, day(9), 1L, "a", 0.0, "{}")) ++   // a: 5 on Jan 9
      Seq((100L, day(1), 2L, "b", 0.0, "{}"),                          // b: sparse
        (101L, day(4), 2L, "b", 0.0, "{}"), (102L, day(4), 2L, "b", 0.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.dailyAnomalies(df)
      .as[(String, java.sql.Date, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4, r._5, r._6))).toMap
    // span-bounded grid (r12 verdict #3): a covers days 1-9, b only
    // its own active span 1-4 — no trailing zero-rows past a key's
    // last observation
    assert(out.size == 13)                       // 9 (a) + 4 (b)
    assert(out(("a", "2026-01-09")) == ((5L, 7L, 7L, true)))   // 5 vs mean 1
    assert(out(("a", "2026-01-01")) == ((1L, 0L, 0L, false)))  // no history
    assert(out(("a", "2026-01-05")) == ((1L, 4L, 4L, false)))  // at the mean
    assert(out(("b", "2026-01-02")) == ((0L, 1L, 1L, false)))  // gap day filled
    assert(out(("b", "2026-01-04")) == ((2L, 1L, 3L, true)))   // 2 vs mean 1/3
    assert(!out.contains(("b", "2026-01-09")),
      "no grid rows past a key's own span")
  }

  test("rolling actives: DAU/WAU/stickiness over the calendar spine") {
    def day(d: Int): Timestamp = Timestamp.valueOf(f"2026-01-$d%02d 12:00:00")
    // u1: days 1,2; u2: day 1; u3: day 9
    val df = Seq(
        (1L, day(1), 1L, "a", 0.0, "{}"), (2L, day(1), 2L, "a", 0.0, "{}"),
        (3L, day(2), 1L, "a", 0.0, "{}"), (4L, day(9), 3L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.rollingActives(df)
      .as[(java.sql.Date, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap
    assert(out.size == 9)
    assert(out("2026-01-01") == ((2L, 2L, 1000000L)))
    assert(out("2026-01-02") == ((1L, 2L, 500000L)))   // both in window
    assert(out("2026-01-07") == ((0L, 2L, 0L)))        // day 1 still in
    assert(out("2026-01-08") == ((0L, 1L, 0L)))        // only u1's day 2
    assert(out("2026-01-09") == ((1L, 1L, 1000000L)))  // u3 alone
  }

  test("activity streaks: gaps-and-islands lengths + earliest-start tie-break") {
    def day(d: Int): Timestamp = Timestamp.valueOf(f"2026-01-$d%02d 09:00:00")
    // u1: 1,2,3 | 5,6 | 10 -> best 3 from Jan 1
    // u2: 1,2 | 4,5 -> two len-2 streaks, tie -> earliest start
    val rows =
      Seq(1, 2, 3, 5, 6, 10).zipWithIndex.map { case (d, i) =>
        (i.toLong, day(d), 1L, "a", 0.0, "{}") } ++
      Seq(1, 2, 4, 5).zipWithIndex.map { case (d, i) =>
        (100L + i, day(d), 2L, "a", 0.0, "{}") }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.activityStreaks(df)
      .as[(Long, Long, Long, Long, java.sql.Date)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5.toString))).toMap
    assert(out == Map(
      1L -> ((3L, 6L, 3L, "2026-01-01")),
      2L -> ((2L, 4L, 2L, "2026-01-01"))))
  }

  test("session paths: gap sessionization + ordered path strings") {
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // user 10: clicks 5 min apart; user 11: exactly-30-min gap stays
    // one session (boundary inclusive); user 12: singleton
    val out = EventStreams.sessionPaths(df, gapMinutes = 30)
      .as[(String, Long)].collect().toMap
    assert(out == Map("click>click" -> 1L, "view>click" -> 1L, "view" -> 1L))
    // a 29-minute gap splits user 11's pair into two sessions
    val tight = EventStreams.sessionPaths(df, gapMinutes = 29)
      .as[(String, Long)].collect().toMap
    assert(tight == Map("click>click" -> 1L, "view" -> 2L, "click" -> 1L))
  }

  test("streamingLmScore: accumulated epochs == one-shot batch scoring") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((10L, "a b c a b c d e"), (11L, "a b c x y z a b"))
      .toDF("doc_id", "text")
    graft.ext.TextOps.writeLmWeights("streamspec_lm", train)
    val b1 = Seq((0L, "a b c d"), (1L, "x y z q"))
    val b2 = Seq((2L, "a b x"), (3L, "c d e a b c"))
    val outDir = java.nio.file.Files.createTempDirectory("lm_out").toString
    val stream = MemoryStream[(Long, String)]
    val q = graft.ext.TextOps.streamingLmScore("streamspec_lm",
      stream.toDF().toDF("doc_id", "text"), outDir)
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "n_trigrams", "score_sum", "mean_q")
      .as[(Long, Long, Long, Long)].collect().toSet
    val oneShot = graft.ext.TextOps.trigramBackoffScore(train,
        (b1 ++ b2).toDF("doc_id", "text"))
      .select("doc_id", "n_trigrams", "score_sum", "mean_q")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == oneShot)
    assert(streamed.nonEmpty)
  }
}
