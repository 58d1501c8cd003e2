package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

/** Streaming shapes driven through MemoryStream → memory sink. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowCategorize aggregates a stream into categorized bins") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val out = Streaming.windowCategorize(df, "ts", "value", 5.0, 200.0,
      keyCols = Seq("event_type"))
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("cat_out").start()
    try {
      in.addData(
        (t("2024-01-01 00:00:10"), "click", 50.0),
        (t("2024-01-01 00:01:10"), "click", 60.0),
        (t("2024-01-01 00:02:10"), "click", 300.0), // outlier
        (t("2024-01-01 00:06:10"), "click", 70.0))
      q.processAllAvailable()
      val rows = spark.table("cat_out").orderBy("start_time").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("category") == "high active") // 1/3 out
      assert(rows(0).getAs[Long]("n") == 3)
      assert(rows(1).getAs[String]("category") == "rest")
    } finally q.stop()
  }

  test("psiBinCountsStream + psiFromCounts: windowed drift vs reference") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("ts", "value")
    val out = Streaming.psiBinCountsStream(df, "ts", "value",
      binWidth = 10.0, windowMinutes = 5, watermark = "1 minute")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("psi_counts").start()
    try {
      // window [00:00, 00:05): bins 0 and 1, two rows each
      in.addData(
        (t("2024-01-01 00:00:10"), 1.0), (t("2024-01-01 00:00:20"), 9.0),
        (t("2024-01-01 00:01:10"), 11.0), (t("2024-01-01 00:02:10"), 19.0))
      q.processAllAvailable()
      // advance the watermark far past the window so append finalizes it
      in.addData((t("2024-01-01 00:20:00"), 5.0))
      q.processAllAvailable()
      val counts = spark.table("psi_counts")
        .filter(col("start_time") === t("2024-01-01 00:00:00"))
      assert(counts.count() == 2) // bins 0 and 1
      val ref = Seq((0L, 0.8), (1L, 0.2)).toDF("bin", "p_ref")
      val psi = Streaming.psiFromCounts(counts, ref).head()
      assert(psi.getAs[Long]("n_bins") == 2L)
      // (.5-.8)·ln(.5/.8) + (.5-.2)·ln(.5/.2)
      val expected = (0.5 - 0.8) * math.log(0.5 / 0.8) +
        (0.5 - 0.2) * math.log(0.5 / 0.2)
      assert(math.abs(psi.getAs[Double]("psi") - expected) < 1e-12)
    } finally q.stop()
  }

  test("streaming PSI parity: a finalized window reproduces batch " +
    "Stats.psi on q97's full cohort inputs from the events table") {
    implicit val sqlCtx = spark.sqlContext
    // q97's exact inputs: the testdata events table, cohorts a/b by
    // md5 bucket of event_id, binWidth 50. The sf0.001 stream is sparse
    // (~1000 events over a month), so ONE wide tumbling window spans the
    // whole table and the finalized streaming window sees exactly the
    // rows the batch query sees.
    val ev = graft.io.Readers.table(spark, "/root/testdata/sf0.001",
        "events")
      .filter(col("value").isNotNull)
      .withColumn("coh",
        when(graft.text.TextOps.hashBucket(col("event_id"), 2) === 0, "a")
          .otherwise("b"))
    val win = ev.cache()
    val batch = graft.ops.Stats.psi(win, "coh", "value", "a", "b",
      binWidth = 50.0).head()
    assert(batch.getAs[Long]("n_bins") > 0,
      "q97's inputs should produce common bins")

    // stream cohort a (the monitored side); cohort b is the static
    // reference distribution, exactly Stats.psi's (p_a − p_b) direction
    val bTot = win.filter(col("coh") === "b").count().toDouble
    val ref = win.filter(col("coh") === "b")
      .groupBy(floor(col("value") / 50.0).cast("long").as("bin"))
      .agg((count(lit(1)) / lit(bTot)).as("p_ref"))
    val aRows = win.filter(col("coh") === "a")
      .select(col("ts"), col("value").cast("double"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toSeq

    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("ts", "value")
    // 100-year tumbling windows (epoch-aligned, so [1970, 2070) is ONE
    // window): the whole one-month table lands in a single window — a
    // 60-day window would split it at an epoch-aligned boundary
    val out = Streaming.psiBinCountsStream(df, "ts", "value",
      binWidth = 50.0, windowMinutes = 60 * 24 * 365 * 100,
      watermark = "1 minute")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("psi_parity_counts").start()
    try {
      in.addData(aRows: _*)
      q.processAllAvailable()
      // a sentinel decades past the window advances the watermark so
      // append finalizes it (the sentinel's own window never emits)
      in.addData((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"), 0.0))
      q.processAllAvailable()
      val counts = spark.table("psi_parity_counts")
        .filter(col("end_time") < lit(
          java.sql.Timestamp.valueOf("2099-01-01 00:00:00")))
      val got = Streaming.psiFromCounts(counts, ref).head()
      assert(got.getAs[Long]("n_bins") == batch.getAs[Long]("n_bins"),
        s"bin domains diverged: ${got.getAs[Long]("n_bins")} vs " +
          s"${batch.getAs[Long]("n_bins")}")
      // batch rounds to 6dp; allow that quantum plus float noise
      assert(math.abs(got.getAs[Double]("psi") -
        batch.getAs[Double]("psi")) < 2e-6,
        s"streaming PSI ${got.getAs[Double]("psi")} != batch " +
          s"${batch.getAs[Double]("psi")}")
    } finally { q.stop(); win.unpersist() }
  }

  test("noveltyStream: cross-batch memory drops repeats, within-batch " +
    "dedup is exact, sources independent") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Streaming.DocIn]
    val out = Streaming.noveltyStream(in.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("nov_out").start()
    try {
      in.addData(Streaming.DocIn("sa", 1L, "alpha beta alpha"),
        Streaming.DocIn("sa", 2L, "beta gamma"),
        Streaming.DocIn("sb", 3L, "alpha"))
      q.processAllAvailable()
      // sa batch 1: distinct {alpha,beta,gamma} all novel; sb independent
      in.addData(Streaming.DocIn("sa", 4L, "gamma delta"),
        Streaming.DocIn("sb", 5L, "alpha"))
      q.processAllAvailable()
      val rows = spark.table("nov_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows == Set(
        ("sa", 2L, 3L, 3L), // trigger 1: alpha, beta, gamma all new
        ("sb", 1L, 1L, 1L),
        ("sa", 1L, 2L, 1L), // trigger 2: gamma remembered, delta novel
        ("sb", 1L, 1L, 0L))) // sb's alpha repeats for sb
    } finally q.stop()
  }

  test("curateStage1: parity with batch curate's stage-1 survivor set " +
    "knob-for-knob, and runs as a real append-mode stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val good1 = "The quick brown fox jumps over the lazy dog and then " +
      "it runs far away to the old stone house by the river bank."
    val good2 = "A slow grey owl glides over the quiet field at night " +
      "and waits for the small mouse to come out of its hole there."
    val nonEnglish = "zxq vbn mlp qrs tuv wxy zab cde fgh ijk lmn opq"
    val damaged = good1.replace("fox", "f�x")
    val blocked = "the damnword sits right here in an otherwise clean " +
      "english sentence that the gate must count and then reject now."
    val braceDoc = "var config = {\n" + good2
    val rows = Seq(
      (1L, good1), (2L, good2), (3L, nonEnglish), (4L, damaged),
      (5L, blocked), (6L, braceDoc))
    val docs = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("x")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
    val knobsBatch = Streaming.curateStage1(docs, minQuality = 0.2,
      blockWords = Some(Seq("damnword")), dropDamaged = true,
      c4Lines = true)
    val stage1Ids = knobsBatch.select("doc_id").as[Long].collect().toSet
    // full curate with the SAME knobs (texts are distinct and unrelated,
    // so dedup/caps/decon downstream keep every stage-1 survivor)
    val curated = graft.pipeline.Pipelines.curate(docs, minQuality = 0.2,
      minJaccard = 0.95, blockWords = Some(Seq("damnword")),
      dropDamaged = true, c4Lines = true)
    val curatedIds = curated.select("doc_id").as[Long].collect().toSet
    assert(stage1Ids == curatedIds,
      s"stage1 $stage1Ids vs curate $curatedIds")
    assert(stage1Ids == Set(1L, 2L), s"got $stage1Ids")
    // the identical composition executes as a streaming query —
    // map-only, no watermark, append mode
    val in = MemoryStream[(Long, String)]
    val out = Streaming.curateStage1(
      in.toDF().toDF("doc_id", "text"), minQuality = 0.2,
      blockWords = Some(Seq("damnword")), dropDamaged = true,
      c4Lines = true)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stage1_out").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stage1_out")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == stage1Ids, s"streamed $streamed")
    } finally q.stop()
  }

  test("fuzzyIndexDetections: streaming detections against the stored " +
    "signature index match the batch gate's drop set exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.dedup.Dedup
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs away to the old stone house by the river bank and sleeps " +
      "there quietly until the bright morning sun rises again slowly"
    val corpus = Seq((1L, base),
      (2L, "completely unrelated words about catalyst tungsten codegen " +
        "shuffles partitions and broadcast joins in a query engine"))
      .toDF("doc_id", "text")
    val idx = Dedup.buildSignatureIndex(corpus, numHashes = 16, bands = 4)
    // batch: one near-dup (one word changed), one fresh, one null
    val batchRows = Seq(
      (10L, base.replace("bright", "dim")),
      (11L, "a genuinely fresh document about sailing boats across the " +
        "wide open sea under a grey sky full of wheeling gulls"),
      (12L, null.asInstanceOf[String]))
    val batchDf = batchRows.toDF("doc_id", "text")
    val batchDropped = batchDf.select("doc_id").except(
      Dedup.incrementalNewFuzzyIndexed(batchDf, idx, minJaccard = 0.3,
        numHashes = 16, bands = 4).select("doc_id"))
      .as[Long].collect().toSet
    val in = MemoryStream[(Long, String)]
    val out = Streaming.fuzzyIndexDetections(
      in.toDF().toDF("doc_id", "text"), idx, minJaccard = 0.3,
      numHashes = 16, bands = 4)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fuzzy_det").start()
    try {
      in.addData(batchRows: _*)
      q.processAllAvailable()
      val det = spark.table("fuzzy_det")
      val detIds = det.select("doc_id").as[Long].collect().toSet
      assert(detIds == batchDropped && detIds == Set(10L),
        s"stream $detIds vs batch $batchDropped")
      // the detection names its corpus match
      assert(det.select("matched_id").as[Long].collect().toSet == Set(1L))
    } finally q.stop()
  }

  test("sessionAgg groups a stream into gap-based sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "user")
    val out = Streaming.sessionAgg(df, "ts", Seq("user"), gap = "2 seconds")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      in.addData(
        (t("2024-01-01 00:00:00"), "u1"),
        (t("2024-01-01 00:00:01"), "u1"),
        (t("2024-01-01 00:00:10"), "u1"), // 9 s gap → new session
        (t("2024-01-01 00:00:00"), "u2"))
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
      assert(rows.count(_.getAs[String]("user") == "u1") == 2)
      assert(rows.count(_.getAs[String]("user") == "u2") == 1)
    } finally q.stop()
  }

  test("expectationsStream: per-window violation counts for every check") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val df = in.toDF().toDF("ts", "v")
    val out = Streaming.expectationsStream(df, "ts",
      Seq("v_positive" -> (col("v") > 0), "v_small" -> (col("v") < 10)),
      windowDur = "1 minute")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("dq_out").start()
    try {
      in.addData(
        (t("2024-01-01 00:00:05"), 5.0),
        (t("2024-01-01 00:00:20"), -1.0), // fails v_positive
        (t("2024-01-01 00:01:10"), 50.0)) // next window, fails v_small
      q.processAllAvailable()
      val rows = spark.table("dq_out")
        .orderBy("start_time", "check").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2),
          r.getLong(3), r.getLong(4), r.getInt(5))).toSeq
      assert(rows == Seq(
        ("2024-01-01 00:00:00.0", "v_positive", 2L, 1L, 0),
        ("2024-01-01 00:00:00.0", "v_small", 2L, 0L, 1),
        ("2024-01-01 00:01:00.0", "v_positive", 1L, 0L, 1),
        ("2024-01-01 00:01:00.0", "v_small", 1L, 1L, 0)), s"got $rows")
    } finally q.stop()
  }

  test("frequentTokensStream: windowed sketch heavy hitters, exact in " +
    "the small-domain regime") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
    val out = Streaming.frequentTokensStream(df, "ts", "text",
      windowDur = "1 minute", maxMapSize = 64)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("ft_out").start()
    try {
      in.addData(
        (t("2024-01-01 00:00:05"), "spark spark shuffle"),
        (t("2024-01-01 00:00:20"), "spark join"),
        (t("2024-01-01 00:01:10"), "join join")) // next window
      q.processAllAvailable()
      val rows = spark.table("ft_out")
        .orderBy("start_time", "token").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2),
          r.getLong(3))).toSeq
      assert(rows == Seq(
        ("2024-01-01 00:00:00.0", "join", 1L),
        ("2024-01-01 00:00:00.0", "shuffle", 1L),
        ("2024-01-01 00:00:00.0", "spark", 3L),
        ("2024-01-01 00:01:00.0", "join", 2L)), s"got $rows")
    } finally q.stop()
  }

  test("intervalJoinStreams matches rows within the time band per key") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, java.sql.Timestamp)]
    val errors = MemoryStream[(String, java.sql.Timestamp, Double)]
    val out = Streaming.intervalJoinStreams(
      clicks.toDF().toDF("user", "cts"),
      errors.toDF().toDF("user", "ets", "value"),
      "user", "cts", "ets", lowerSec = 5, upperSec = 5,
      watermark = "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      clicks.addData(("u1", t("2024-01-01 00:00:10")),
        ("u2", t("2024-01-01 00:00:10")))
      errors.addData(
        ("u1", t("2024-01-01 00:00:08"), 1.0), // within −5 s
        ("u1", t("2024-01-01 00:00:14"), 2.0), // within +5 s
        ("u1", t("2024-01-01 00:00:30"), 3.0), // outside
        ("u2", t("2024-01-01 00:00:11"), 4.0)) // other key
      q.processAllAvailable()
      val rows = spark.table("ij_out").collect()
        .map(r => (r.getAs[String]("user"), r.getAs[Double]("value")))
        .sorted.toSeq
      assert(rows == Seq(("u1", 1.0), ("u1", 2.0), ("u2", 4.0)))
    } finally q.stop()
  }

  test("dedupStream drops within-watermark duplicate ids, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = in.toDF().toDF("id", "ts", "v")
    val out = Streaming.dedupStream(df, Seq("id"), "ts", "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData(
        (1L, t("2024-01-01 00:00:00"), "a"),
        (1L, t("2024-01-01 00:00:01"), "a-dup"),
        (2L, t("2024-01-01 00:00:02"), "b"))
      q.processAllAvailable()
      in.addData((1L, t("2024-01-01 00:00:03"), "a-dup2"),
        (3L, t("2024-01-01 00:00:04"), "c"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rows.find(_.getAs[Long]("id") == 1L).get
        .getAs[String]("v") == "a")
    } finally q.stop()
  }

  test("flatlineRuns emits completed runs with the include flag") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val in = MemoryStream[Streaming.Obs]
    val out = Streaming.flatlineRuns(in.toDS(), maxRun = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("runs_out").start()
    try {
      in.addData(
        Streaming.Obs("k", t("2024-01-01 00:00:00"), 70.0),
        Streaming.Obs("k", t("2024-01-01 00:01:00"), 70.0),
        Streaming.Obs("k", t("2024-01-01 00:02:00"), 70.0),
        Streaming.Obs("k", t("2024-01-01 00:03:00"), 71.0),
        Streaming.Obs("k", t("2024-01-01 00:04:00"), 72.0))
      q.processAllAvailable()
      val rows = spark.table("runs_out").orderBy("start_time").collect()
      // two completed runs: the 3-long flatline (exclude) and the 71
      // singleton; the open 72-run stays in state
      assert(rows.length == 2)
      assert(rows(0).getAs[Double]("value") == 70.0 &&
        rows(0).getAs[Long]("n") == 3 && !rows(0).getAs[Boolean]("include"))
      assert(rows(1).getAs[Double]("value") == 71.0 &&
        rows(1).getAs[Boolean]("include"))
    } finally q.stop()
  }

  test("funnelStream matches the batch funnel on the shared scenario and " +
    "evicts terminal state") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val in = MemoryStream[Streaming.Ev]
    val out = Streaming.funnelStream(in.toDS(),
      Seq("view", "click", "purchase"), maxGapSec = 3600L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    // same scenario as EventsSpec's first funnel test
    val events = Seq(
      Streaming.Ev(1L, t("2024-01-01 10:00:00"), "view"),
      Streaming.Ev(1L, t("2024-01-01 10:30:00"), "click"),
      Streaming.Ev(1L, t("2024-01-01 10:45:00"), "purchase"),
      Streaming.Ev(2L, t("2024-01-01 09:00:00"), "view"),
      Streaming.Ev(2L, t("2024-01-01 10:00:00"), "click"),
      Streaming.Ev(2L, t("2024-01-01 11:00:01"), "purchase"),
      Streaming.Ev(3L, t("2024-01-01 08:00:00"), "click"),
      Streaming.Ev(3L, t("2024-01-01 09:00:00"), "view"),
      Streaming.Ev(4L, t("2024-01-01 12:00:00"), "view"))
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
      val stepCounts = rows.groupBy("step").count().orderBy("step")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      // batch oracle: per-step user counts on identical data
      val batch = graft.ops.Events.funnel(
        events.map(e => (e.user, e.ts, e.kind))
          .toDF("user_id", "ts", "event_type"),
        Seq("view", "click", "purchase"), maxGapSec = 3600L)
        .filter(col("users") > 0)
        .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
      assert(stepCounts == batch,
        s"stream $stepCounts != batch $batch")
      // u1 completed all steps → emitted exactly 3 conversions
      assert(rows.filter(col("user") === 1L).count() == 3)
      // u2's purchase was 1 s past the deadline → only steps 1-2
      assert(rows.filter(col("user") === 2L).count() == 2)
      // re-entry guard: u1's funnel is complete — a later view must NOT
      // start a second funnel (terminal state is retained, not removed)
      in.addData(Streaming.Ev(1L, t("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_out")
        .filter(col("user") === 1L).count() == 3,
        "completed user re-entered the funnel")
    } finally q.stop()
  }

  test("chatGateForeachBatch: digest table carries the state — batch " +
    "2's exact dup of a batch-1 survivor is dropped, malformed gated") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_chatgate")
    val sink = base.resolve("sink").toString
    val digests = base.resolve("digests").toString
    val ckpt = base.resolve("ckpt").toString
    val in = MemoryStream[(Long, String)]
    val turnsExpr = expr(
      "filter(transform(sequence(0, 3), k -> struct(CASE WHEN k % 2 = 0" +
        " THEN 'user' ELSE 'assistant' END AS role, " +
        "array_join(slice(split(text, ' '), k * 5 + 1, 5), ' ') " +
        "AS content)), x -> length(x.content) > 0)")
    val stream = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), turnsExpr.as("turns"))
    val q = Streaming.chatGateForeachBatch(stream, digests, sink, ckpt)
    try {
      // batch 1: a good conversation + a too-short one (gated out)
      in.addData((1L, "alpha bravo charlie delta echo foxtrot golf " +
        "hotel india juliet kilo"), (2L, "short"))
      q.processAllAvailable()
      // batch 2: an exact re-submission of conversation 1 (same words,
      // different id — only the digest table can catch it) + fresh
      in.addData((10L, "alpha bravo charlie delta echo foxtrot golf " +
        "hotel india juliet kilo"),
        (11L, "quebec romeo sierra tango uniform victor whiskey xray " +
          "yankee zulu"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(sink)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(landed == Seq(1L, 11L), s"landed $landed")
    // the digest table holds exactly the survivors' digests
    assert(spark.read.parquet(digests).distinct().count() == 2L)
  }

  test("curateForeachBatch: the index carries the state — batch 2's " +
    "near-dup of a batch-1 SURVIVOR is dropped, fresh docs land, and " +
    "survivors' signatures appear in the index") {
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_fbgate")
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val corpusText = "alpha bravo charlie delta echo foxtrot golf " +
      "hotel india juliet kilo lima mike november oscar papa"
    val freshText = "quebec romeo sierra tango uniform victor " +
      "whiskey xray yankee zulu one two three four five six"
    try {
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(
          Seq((1L, corpusText)).toDF("doc_id", "text"),
          numHashes = 16, bands = 4),
        "sigidx_fb", buckets = 4)
      val in = MemoryStream[(Long, String)]
      val q = Streaming.curateForeachBatch(
        in.toDF().toDF("doc_id", "text"), "sigidx_fb", sink, ckpt,
        buckets = 4, minJaccard = 0.5, numHashes = 16, bands = 4)
      try {
        // batch 1: a corpus re-crawl (dropped) + a fresh doc (lands)
        in.addData((10L, corpusText), (11L, freshText))
        q.processAllAvailable()
        // batch 2: a re-crawl of batch 1's SURVIVOR — only the grown
        // index can catch it — plus a genuinely new doc
        in.addData((20L, freshText),
          (21L, "gamma entirely different vocabulary spoken here with " +
            "words shared by no earlier document in any batch today"))
        q.processAllAvailable()
      } finally q.stop()
      val landed = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(landed == Seq(11L, 21L), s"landed $landed")
      val indexed = spark.table("sigidx_fb_sigs")
        .select("id").collect().map(_.getLong(0)).toSeq.sorted
      assert(indexed == Seq(1L, 11L, 21L), s"indexed $indexed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sigidx_fb_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_fb_bands")
    }
  }

  test("curateForeachBatch canonicalCollapse: within-batch mirror " +
    "variants collapse to the min-id representative before the " +
    "near-dup gate; with canonicalIndexPath a BATCH-2 mirror of a " +
    "batch-1 survivor is dropped by the stored canonical table") {
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_fbcanon")
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val canonIdx = base.resolve("canon").toString
    val canonHead = "<html><head><link rel=\"canonical\" " +
      "href=\"https://m.example.com/art\"></head><body>z</body></html>"
    try {
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(
          Seq((1L, "alpha bravo charlie delta echo foxtrot golf " +
            "hotel india juliet kilo lima")).toDF("doc_id", "text"),
          numHashes = 16, bands = 4),
        "sigidx_fbc", buckets = 4)
      val in = MemoryStream[(Long, String, String, String)]
      val q = Streaming.curateForeachBatch(
        in.toDF().toDF("doc_id", "text", "url", "html"),
        "sigidx_fbc", sink, ckpt,
        buckets = 4, minJaccard = 0.5, numHashes = 16, bands = 4,
        canonicalCollapse = true,
        canonicalIndexPath = Some(canonIdx))
      try {
        // batch 1: the original, a same-canonical mirror whose text
        // shares NOTHING (the near-dup gate alone could not drop it),
        // and an unrelated page
        in.addData(
          (10L, "quebec romeo sierra tango uniform victor whiskey " +
            "xray yankee zulu one two", "https://m.example.com/art",
            canonHead),
          (11L, "gamma entirely different vocabulary spoken here " +
            "with no shared words at all",
            "https://m.example.com/art?utm_source=feed", canonHead),
          (12L, "november oscar papa golf echo words shared by no " +
            "other document in this batch",
            "https://n.example.com/other",
            "<html><head></head><body>y</body></html>"))
        q.processAllAvailable()
        // batch 2: ANOTHER mirror of the batch-1 survivor (fresh text
        // again — only the stored canonical table can catch it) plus a
        // genuinely new page
        in.addData(
          (20L, "lorem-free completely novel wording present in no " +
            "earlier batch of this stream today",
            "https://m.example.com/art?ref=mirror", canonHead),
          (21L, "unique closing document with vocabulary shared by " +
            "nothing else in the fixture",
            "https://p.example.com/new",
            "<html><head></head><body>w</body></html>"))
        q.processAllAvailable()
      } finally q.stop()
      val landed = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(landed == Seq(10L, 12L, 21L), s"landed $landed")
      // the stored table holds exactly the survivors' canonical keys
      val keys = spark.read.parquet(canonIdx)
        .select("canonical").distinct().count()
      assert(keys == 3L, s"got $keys canonical keys")
      // canonicalIndexPath without the collapse stage is rejected
      intercept[IllegalArgumentException] {
        Streaming.curateForeachBatch(
          in.toDF().toDF("doc_id", "text", "url", "html"),
          "sigidx_fbc", sink, ckpt,
          canonicalIndexPath = Some(canonIdx))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS sigidx_fbc_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_fbc_bands")
    }
  }

  test("curateForeachBatch with the exact-substring stage: a batch-2 " +
    "doc copying a >=40-char span of a batch-1 SURVIVOR drops even " +
    "though it is no MinHash near-dup; survivors' grams append") {
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_fbexact")
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val corpusText = "alpha bravo charlie delta echo foxtrot golf " +
      "hotel india juliet kilo lima mike november oscar papa"
    val freshText = "quebec romeo sierra tango uniform victor " +
      "whiskey xray yankee zulu one two three four five six"
    try {
      val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(corpus, numHashes = 16, bands = 4),
        "sigidx_fbx", buckets = 4)
      Dedup.writeGramIndex(Dedup.buildGramIndex(corpus, minLen = 40),
        "gramidx_fbx", buckets = 4)
      val in = MemoryStream[(Long, String)]
      val q = Streaming.curateForeachBatch(
        in.toDF().toDF("doc_id", "text"), "sigidx_fbx", sink, ckpt,
        buckets = 4, minJaccard = 0.5, numHashes = 16, bands = 4,
        exactSubstrIndex = Some("gramidx_fbx"),
        exactSubstrMinLen = 40, exactSubstrBuckets = 4)
      try {
        in.addData((11L, freshText))
        q.processAllAvailable()
        // batch 2: doc 20 copies chars [5, 55) of the batch-1 SURVIVOR
        // into otherwise-new prose — shingle Jaccard well under 0.5
        // (the fuzzy gate passes it) but an exact 50-char span: only
        // the gram index catches it. Doc 21 does the same against the
        // pre-stream corpus. Doc 22 is genuinely new.
        val spanOfFresh = "ZZ " + freshText.substring(5, 55) +
          " entirely new commentary words follow the copied sentence " +
          "and continue for a while longer with other vocabulary"
        val spanOfCorpus = "QQ " + corpusText.substring(10, 60) +
          " surrounded by totally different prose about other matters " +
          "that no earlier document mentioned in any way"
        in.addData((20L, spanOfFresh), (21L, spanOfCorpus),
          (22L, "gamma entirely different vocabulary spoken here with " +
            "words shared by no earlier document in any batch today"))
        q.processAllAvailable()
      } finally q.stop()
      val landed = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(landed == Seq(11L, 22L), s"landed $landed")
      // the survivors' grams appended: state lives in the stored index
      val idxIds = spark.table("gramidx_fbx_grams")
        .select("id").distinct().collect()
        .map(_.getLong(0)).toSeq.sorted
      assert(idxIds == Seq(1L, 11L, 22L), s"index ids $idxIds")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sigidx_fbx_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_fbx_bands")
      spark.sql("DROP TABLE IF EXISTS gramidx_fbx_grams")
    }
  }

  test("warcDocStream + curateForeachBatch: crawl-to-curated end-to-end " +
    "— two WARC files arrive over time, file 2's near-dup of file 1's " +
    "landed doc is dropped by the grown index, fresh text lands") {
    import graft.dedup.Dedup
    val base = java.nio.file.Files.createTempDirectory("graft_warcstream")
    val drop = base.resolve("drop")
    java.nio.file.Files.createDirectory(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    def warcFile(name: String, recs: (String, String)*): Unit = {
      val bytes = recs.map { case (rid, text) =>
        val body = text.getBytes("UTF-8")
        ("WARC/1.0\r\n" +
          s"WARC-Type: conversion\r\n" +
          s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
          s"WARC-Target-URI: https://crawl.example/$rid\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++
          body ++ "\r\n\r\n".getBytes("US-ASCII")
      }.reduce(_ ++ _)
      java.nio.file.Files.write(drop.resolve(name), bytes)
    }
    val t1 = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val t1near = t1.replace("papa", "quebec") // one word changed
    val fresh = "seven eight nine ten eleven twelve thirteen fourteen " +
      "fifteen sixteen seventeen eighteen nineteen twenty twentyone"
    try {
      // seed index with an unrelated doc (the stored-state contract)
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(
          Seq((1L, "zeta eta theta iota kappa mu nu xi omicron pi rho " +
            "sigma tau upsilon phi chi")).toDF("doc_id", "text"),
          numHashes = 16, bands = 4),
        "sigidx_warc", buckets = 4)
      warcFile("seg1.warc", ("w1", t1))
      val docs = Streaming.warcDocStream(spark, drop.toString)
      assert(docs.isStreaming)
      val q = Streaming.curateForeachBatch(docs, "sigidx_warc", sink,
        ckpt, buckets = 4, minJaccard = 0.5, numHashes = 16, bands = 4)
      try {
        q.processAllAvailable()
        // file 2 arrives later: a near-dup of file 1's LANDED doc (only
        // the grown index knows it) + a genuinely fresh doc
        warcFile("seg2.warc", ("w2", t1near), ("w3", fresh))
        q.processAllAvailable()
      } finally q.stop()
      val landed = spark.read.parquet(sink)
        .select("text").collect().map(_.getString(0)).toSet
      assert(landed == Set(t1, fresh), s"landed $landed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sigidx_warc_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_warc_bands")
    }
  }

  test("arenaLeaderboardForeachBatch: two micro-batches fold into the " +
    "stored sufficient statistics; the rewritten leaderboard equals " +
    "the batch arenaLeaderboard over the unioned matches bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // batch 0: ONLY ties and an invalid self-match — its games delta is
    // empty, so games/ holds no parquet yet; the refit must skip (an
    // unguarded read.parquet would throw "Unable to infer schema" and
    // kill the query) and no leaderboard may appear.
    // batch 1: m1-m3 only, with one invalid self-match and one tie
    // (tie shapes n_matches but not decided games — both paths must
    // treat it identically); batch 2 introduces m4
    val b0 = Seq(("m1", "m2", "tie"), ("m3", "m3", "m3"))
    val b1 = Seq(("m1", "m2", "m1"), ("m1", "m3", "m3"),
      ("m2", "m3", "m2"), ("m1", "m2", "m2"), ("m1", "m1", "m1"),
      ("m2", "m3", "tie"))
    val b2 = Seq(("m1", "m2", "m1"), ("m2", "m3", "m3"),
      ("m1", "m3", "m1"), ("m1", "m4", "m4"), ("m4", "m2", "m4"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_arena_stream").toString
    val in = MemoryStream[(String, String, String)]
    val q = Streaming.arenaLeaderboardForeachBatch(
      in.toDF().toDF("model_a", "model_b", "winner"),
      s"$dir/state", s"$dir/leaderboard", s"$dir/ck")
    try {
      in.addData(b0: _*)
      q.processAllAvailable()
      // the query survived the empty games delta and wrote no board
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/leaderboard")))
      in.addData(b1: _*)
      q.processAllAvailable()
      // interim leaderboard: only the three models seen so far
      assert(spark.read.parquet(s"$dir/leaderboard").count() == 3)
      // compact BETWEEN batches: committed deltas fold into the
      // batch_id = -1 partition, the highest live batch stays verbatim
      // (the at-least-once replay partition), and the stream continues
      Streaming.compactArenaState(spark, s"$dir/state")
      val partsAfter = spark.read.parquet(s"$dir/state/pairs")
        .select(col("batch_id").cast("long")).distinct().collect()
        .map(_.getLong(0)).toSeq.sorted
      assert(partsAfter == Seq(-1L, 1L), s"parts $partsAfter")
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/leaderboard")
      .orderBy("arena_rank").collect().toSeq
    val batch = graft.ops.Chat.arenaLeaderboard(
        (b0 ++ b1 ++ b2).toDF("model_a", "model_b", "winner"))
      .orderBy("arena_rank").collect().toSeq
    assert(streamed == batch, s"\nstream: $streamed\nbatch:  $batch")
    // the state holds counts, not matches: no match payload column
    val pairCols = spark.read.parquet(s"$dir/state/pairs").columns.toSet
    assert(pairCols == Set("i", "j", "n", "batch_id"))
    // compacting the STOPPED stream's full state changes nothing the
    // refit can see: the rebuilt leaderboard is bit-identical
    Streaming.compactArenaState(spark, s"$dir/state")
    def tot(d: String, keys: Seq[String], sums: Seq[String]) =
      spark.read.parquet(s"$dir/state/$d")
        .groupBy(keys.map(col): _*)
        .agg(sum(sums.head).as(sums.head),
          sums.tail.map(c => sum(c).as(c)): _*)
    val refit = graft.ops.Chat.arenaLeaderboardFromState(
        tot("pairs", Seq("i", "j"), Seq("n")),
        tot("wins", Seq("model"), Seq("wins")),
        tot("games", Seq("model"), Seq("n_games", "wins")),
        iterations = 2, z = 1.96)
      .orderBy("arena_rank").collect().toSeq
    assert(refit == batch, s"\nrefit: $refit\nbatch: $batch")
  }

  test("lossAuditForeachBatch: per-batch OLS sums fold into stored " +
    "state; the rewritten audit equals the batch lossTrajectories " +
    "over all telemetry bit for bit; compaction changes nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // batch 0: all rows invalid (null loss) → no state lands, the
    // refit must skip and write no audit
    val b0: Seq[(java.lang.Long, java.lang.Integer, java.lang.Long)] =
      Seq((1L, 0, null), (2L, 0, null))
    // batches 1/2/3 split each doc's 8 steps 0-2 / 3-5 / 6-7 — the
    // batch audit over the union is the ground truth (doc 1 learned
    // with slope exactly -100, doc 2 memorized, doc 3 stagnant)
    def steps(lo: Int, hi: Int)
        : Seq[(java.lang.Long, java.lang.Integer, java.lang.Long)] =
      (lo to hi).flatMap(x => Seq(
        (java.lang.Long.valueOf(1L), java.lang.Integer.valueOf(x),
          java.lang.Long.valueOf(2000L - 100L * x)),
        (java.lang.Long.valueOf(2L), java.lang.Integer.valueOf(x),
          java.lang.Long.valueOf(770L - 100L * x)),
        (java.lang.Long.valueOf(3L), java.lang.Integer.valueOf(x),
          java.lang.Long.valueOf(900L))))
    val b1 = steps(0, 2)
    val b2 = steps(3, 5)
    val b3 = steps(6, 7)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_loss_stream").toString
    val in = MemoryStream[(java.lang.Long, java.lang.Integer,
      java.lang.Long)]
    val q = Streaming.lossAuditForeachBatch(
      in.toDF().toDF("doc_id", "step", "loss_milli"),
      s"$dir/state", s"$dir/audit", s"$dir/ck")
    try {
      in.addData(b0: _*)
      q.processAllAvailable()
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/audit")))
      in.addData(b1: _*)
      q.processAllAvailable()
      // interim audit exists and covers the three docs
      assert(spark.read.parquet(s"$dir/audit").count() == 3)
      in.addData(b2: _*)
      q.processAllAvailable()
      // compact between batches: committed partitions fold to -1,
      // the latest live partition survives for replay safety
      Streaming.compactLossState(spark, s"$dir/state")
      val parts = spark.read.parquet(s"$dir/state/loss_state")
        .select(col("batch_id").cast("long")).distinct().collect()
        .map(_.getLong(0)).toSeq.sorted
      assert(parts == Seq(-1L, 2L), s"parts $parts")
      in.addData(b3: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/audit")
      .orderBy("doc_id").collect().toSeq
    val batch = graft.ops.Training.lossTrajectories(
        (b0 ++ b1 ++ b2 ++ b3).toDF("doc_id", "step", "loss_milli"))
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch, s"\nstream: $streamed\nbatch:  $batch")
    assert(streamed.map(_.getString(5)).toList ==
      List("learned", "memorized", "stagnant"))
    // state is sufficient statistics, never telemetry payloads
    val cols = spark.read.parquet(s"$dir/state/loss_state").columns.toSet
    assert(cols == Set("doc_id", "n_steps", "sx", "sy", "sxx", "sxy",
      "min_y", "max_y", "first_step", "first_milli", "last_step",
      "last_milli", "batch_id"))
    // compacting the stopped stream's full state: the re-merged audit
    // is bit-identical
    Streaming.compactLossState(spark, s"$dir/state")
    val remerged = graft.ops.Training.classifyFromState(
        graft.ops.Training.mergeLossStates(
          spark.read.parquet(s"$dir/state/loss_state")
            .drop("batch_id")))
      .orderBy("doc_id").collect().toSeq
    assert(remerged == batch, s"\nremerged: $remerged\nbatch: $batch")
  }

  test("exportForeachBatch: two micro-batches land immutable batch_id " +
    "shard dirs; recombined survivors equal the batch E9 export's; " +
    "manifest rows match shard contents; webdataset leg keys by doc") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.io.Tfrecord
    val proseA = "The quick brown fox jumps over the lazy dog and " +
      "then it runs far away to the old stone house by the river " +
      "bank where it sleeps through the warm afternoon."
    val proseB = "A slow grey owl glides over the quiet field at " +
      "night and waits patiently for the small mouse to come out " +
      "of its hole under the wooden fence near the barn."
    def enrich(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
    val b1 = Seq((60L, proseA), (63L, "x")) // junk drops in curate
    val b2 = Seq((62L, proseB), (64L, "y"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_exp_stream").toString
    val in = MemoryStream[(Long, String)]
    val q = Streaming.exportForeachBatch(
      enrich(in.toDF().toDF("doc_id", "text")),
      s"$dir/out", s"$dir/ck", maxTokens = 64, nShards = 2)
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // per-batch immutable shard dirs exist
    assert(new java.io.File(s"$dir/out/batch_id=0").exists())
    assert(new java.io.File(s"$dir/out/batch_id=1").exists())
    def projected(path: String) =
      Tfrecord.readRecords(spark, path).collect()
        .map(r => Tfrecord.parseExample(r.getAs[Array[Byte]]("payload"))
          .map(f => f._1 -> f).toMap)
        .map(m => (m("doc_id")._3.head,
          new String(m("text")._2.head, "UTF-8"),
          m("n_tokens")._3.head, m("shard")._3.head)).toSet
    val streamed = projected(s"$dir/out/batch_id=*")
    // the batch E9 export over the union is the ground truth: same
    // survivor docs, texts, token counts, and md5 shard routing (pack
    // ids are per-micro-batch by design and deliberately not compared)
    val batchDir = java.nio.file.Files
      .createTempDirectory("graft_exp_batch").resolve("out").toString
    graft.pipeline.Pipelines.exportTrainingShards(
      enrich((b1 ++ b2).toDF("doc_id", "text")), batchDir,
      maxTokens = 64, nShards = 2)
    assert(streamed == projected(batchDir),
      s"\nstream: $streamed\nbatch:  ${projected(batchDir)}")
    assert(streamed.map(_._1) == Set(60L, 62L))
    // manifest: one row set per batch partition, counts = records
    val man = spark.read.parquet(s"$dir/out/_manifest")
    assert(man.select(col("batch_id").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(man.agg(sum("n_records")).head().getLong(0) == 2L)
    // webdataset leg: same stage, tar members keyed by doc_id
    val dirW = java.nio.file.Files
      .createTempDirectory("graft_exp_wds").toString
    val inW = MemoryStream[(Long, String)]
    val qW = Streaming.exportForeachBatch(
      enrich(inW.toDF().toDF("doc_id", "text")),
      s"$dirW/out", s"$dirW/ck", maxTokens = 64, nShards = 2,
      format = "webdataset")
    try {
      inW.addData(b1: _*)
      qW.processAllAvailable()
    } finally qW.stop()
    val members = graft.io.WebDataset
      .readMembers(spark, s"$dirW/out/batch_id=0").collect()
      .map(_.getString(1)).toSet
    assert(members.contains("60.text") && members.contains("60.shard"),
      s"got $members")
    assert(!members.exists(_.startsWith("63.")))
    // the UNIGRAM tokenizerPath leg: the stream packs by per-batch
    // tokenBudgets (domain DP + join-back — tokenCounter alone refuses
    // unigram files) and must agree with the batch export's budgets
    val tokDir = java.nio.file.Files
      .createTempDirectory("graft_exp_uni")
    val tokPath = tokDir.resolve("uni.json").toString
    graft.text.TokenizerFiles.writeTokenizerJsonUnigram(spark, tokPath,
      ('a' to 'z').map(c => (c.toString, -3.0)) ++
        Seq(("the", -1.0), ("qu", -1.5), ("ck", -1.5)))
    val dirU = java.nio.file.Files
      .createTempDirectory("graft_exp_unis").toString
    val inU = MemoryStream[(Long, String)]
    val qU = Streaming.exportForeachBatch(
      enrich(inU.toDF().toDF("doc_id", "text")),
      s"$dirU/out", s"$dirU/ck", maxTokens = 64, nShards = 2,
      tokenizerPath = Some(tokPath))
    try {
      inU.addData(b1: _*)
      qU.processAllAvailable()
    } finally qU.stop()
    val batchDirU = tokDir.resolve("batch_out").toString
    graft.pipeline.Pipelines.exportTrainingShards(
      enrich(b1.toDF("doc_id", "text")), batchDirU,
      maxTokens = 64, nShards = 2, tokenizerPath = Some(tokPath))
    assert(projected(s"$dirU/out/batch_id=0") == projected(batchDirU))
  }

  test("momentsForeachBatch: three micro-batches of vectors land one " +
    "moment row each; the refit model equals the one-pass batch fit " +
    "(eigenvalues within 1e-9, axes aligned up to sign); an all-null " +
    "batch adds nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ml.Pca
    val pts = (0 until 48).map { i =>
      val t = i * 0.25; val u = (i % 5) * 0.5
      (i.toLong, Seq((t + u).toFloat, (2.0 * t - u).toFloat,
        (0.5 * u + 3.0).toFloat))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pca_stream").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.momentsForeachBatch(
      in.toDF().toDF("vec_id", "embedding"),
      s"$dir/state", s"$dir/model", s"$dir/ck", k = 3, dim = 3)
    try {
      in.addData(pts.filter(_._1 % 3 == 0): _*)
      q.processAllAvailable()
      in.addData(pts.filter(_._1 % 3 == 1): _*)
      q.processAllAvailable()
      // an all-null batch: no moment row, model untouched afterwards
      in.addData(Seq((999L, null.asInstanceOf[Seq[Float]])): _*)
      q.processAllAvailable()
      in.addData(pts.filter(_._1 % 3 == 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.parquet(s"$dir/state/pca_moments")
    assert(state.count() == 3L, s"got ${state.count()} moment rows")
    val model = spark.read.parquet(s"$dir/model").head()
    val one = Pca.fitPca(pts.toDF("vec_id", "embedding"), k = 3, dim = 3)
    val ev = model.getSeq[Double](model.fieldIndex("eigenvalues"))
    ev.zip(one.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"eigenvalue drift: $a vs $b") }
    val comps = model.getSeq[scala.collection.Seq[Double]](
      model.fieldIndex("components"))
    comps.zip(one.components).foreach { case (va, vb) =>
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
        s"axis misaligned: |dot| = ${math.abs(dot)}") }
  }

  test("annIngestForeachBatch: two streamed batches append into the " +
    "coded IVF corpus (auto-quantized), a replayed id appends zero " +
    "rows, the ingest log carries per-batch counts, and the stored " +
    "binary probe matches the in-memory composition over everything " +
    "ingested") {
    import graft.ml.Similarity
    import graft.io.Writers
    implicit val sqlCtx = spark.sqlContext
    val dim = 4
    val base = java.nio.file.Files.createTempDirectory("graft_annfb")
    val corpus = base.resolve("corpus").toString
    val ckpt = base.resolve("ckpt").toString
    val log = base.resolve("log").toString
    // frozen centroids + a CODED seed corpus (the serving layout)
    val seed = Seq(
      (0L, Seq(10f, 0f, 0f, 0f)), (1L, Seq(0f, 10f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(10.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 10.0, 0.0, 0.0)))
    Writers.partitionedParquet(
      Similarity.quantizeBinary(
        Similarity.assignToCentroids(seed, cents, dim = dim),
        dim = dim)
        .select("vec_id", "embedding", "bvec", "cluster"),
      corpus, Seq("cluster"))
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.annIngestForeachBatch(
      in.toDF().toDF("vec_id", "embedding"), corpus, cents, ckpt,
      dim = dim, logPath = Some(log))
    try {
      in.addData((10L, Seq(9f, 1f, 0f, 0f)), (11L, Seq(1f, 9f, 0f, 0f)),
        (12L, Seq(8f, 0f, 1f, 0f)), (13L, Seq(0f, 8f, 1f, 0f)))
      q.processAllAvailable()
      // batch 2: two new vectors + a REPLAY of id 10 (the
      // at-least-once hazard) — the pruned id anti-join must skip it
      in.addData((20L, Seq(7f, 2f, 0f, 0f)), (21L, Seq(2f, 7f, 0f, 0f)),
        (10L, Seq(9f, 1f, 0f, 0f)))
      q.processAllAvailable()
      // batch 2: an INTRA-batch duplicate id (30 twice) must append
      // once; and a TOMBSTONED id must be RE-INGESTABLE — delete 12
      // and 13, stream 12 again: its tombstone clears (the physical
      // row answers probes again, no duplicate appended) while 13
      // stays deleted
      Similarity.removeFromIvfIndex(spark, corpus,
        Seq(12L, 13L).toDF("vec_id"))
      in.addData((30L, Seq(6f, 3f, 0f, 0f)), (30L, Seq(6f, 3f, 0f, 0f)),
        (12L, Seq(8f, 0f, 1f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.read.parquet(corpus)
    assert(stored.count() == 9L, // 2 seed + 4 + 2 + 30; replays skipped
      s"got ${stored.count()} corpus rows")
    assert(stored.filter(col("vec_id") === 10L).count() == 1L,
      "replayed id duplicated")
    assert(stored.filter(col("vec_id") === 30L).count() == 1L,
      "intra-batch duplicate id appended twice")
    assert(stored.filter(col("vec_id") === 12L).count() == 1L,
      "re-ingested tombstoned id duplicated")
    // the re-ingested id answers probes again; the untouched delete
    // stays deleted
    val live = Similarity.readIvfCorpus(spark, corpus)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live.contains(12L), "re-ingested id still tombstoned")
    assert(!live.contains(13L), "un-reingested tombstone resurrected")
    // schema-aware append: every streamed row carries its codes
    assert(stored.filter(col("bvec").isNull).count() == 0L,
      "append landed code-less rows")
    // ingest log: per-batch appended counts (batch 1's replay and
    // batch 2's duplicate/re-ingest all skipped), landed exactly-once
    // under per-batch partitions
    val logged = spark.read.parquet(log)
      .groupBy("batch_id").agg(sum("n_appended").as("n"))
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1))
      .toMap
    assert(logged == Map(0L -> 4L, 1L -> 2L, 2L -> 1L), s"log: $logged")
    // serving parity: the stored probe equals the in-memory
    // composition over the LIVE corpus (tombstones honored on both
    // sides — the stored path reads through readIvfCorpus)
    val inMemCorpus = Similarity.readIvfCorpus(spark, corpus)
      .select("vec_id", "embedding", "cluster")
    val centDf = Similarity.ivfIndex(inMemCorpus, "cluster")
    val qv = Array(1.0, 0.2, 0.0, 0.0)
    val servedQ = Similarity.binaryIvfTopKStored(spark, corpus,
      centDf, qv, k = 4, nProbe = 2, rerankK = 8, dim = dim)
    val served = servedQ.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMem = Similarity.binaryIvfTopK(inMemCorpus, qv, 4, "cluster",
        nProbe = 2, rerankK = 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == inMem, s"stored diverged: $served vs $inMem")
    // the x-leaning query's top-4 are exactly the x-side vectors,
    // streamed and seed alike
    assert(served.map(_._1).toSet == Set(20L, 10L, 0L, 12L),
      s"served: $served")
  }
  test("curateForeachBatch pplRef: the stream-setup reference LM " +
    "drops a gibberish doc in any batch, clean docs land, the gate " +
    "composes before the near-dup index") {
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    def sentence(i: Long): String =
      s"the cat $i sat on the mat ${i * 3 + 7} while the dog " +
        s"${i * 5 + 11} watched the bird ${i * 7 + 13} in the tree."
    val base = java.nio.file.Files.createTempDirectory("graft_fbppl")
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val ref = (1000L until 1040L).map(i => (i, sentence(i)))
      .toDF("doc_id", "text")
    try {
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(
          Seq((1L, sentence(1L))).toDF("doc_id", "text"),
          numHashes = 16, bands = 4),
        "sigidx_fbppl", buckets = 4)
      val in = MemoryStream[(Long, String)]
      val q = Streaming.curateForeachBatch(
        in.toDF().toDF("doc_id", "text"),
        "sigidx_fbppl", sink, ckpt,
        buckets = 4, minJaccard = 0.5, numHashes = 16, bands = 4,
        pplRef = Some(ref), pplMaxNll = 4.5)
      try {
        in.addData(
          (10L, sentence(10L)),
          (11L, "zq vx qk jw zzp qqv xxj wwk zzq qvv"))
        q.processAllAvailable()
        in.addData(
          (20L, sentence(777L)),
          (21L, "qq zz vv kk jj ww pp xx yy gg hh"))
        q.processAllAvailable()
      } finally q.stop()
      val landed = spark.read.parquet(sink)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(landed == Seq(10L, 20L), s"landed $landed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sigidx_fbppl_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_fbppl_bands")
    }
  }

  test("annServeForeachBatch: streamed query batches land per-batch " +
    "result directories matching the batched stored probe — the " +
    "serving loop's query half") {
    import graft.ml.Similarity
    import graft.io.Writers
    implicit val sqlCtx = spark.sqlContext
    val dim = 4
    val base = java.nio.file.Files.createTempDirectory("graft_annsrv")
    val corpus = base.resolve("corpus").toString
    val results = base.resolve("results").toString
    val ckpt = base.resolve("ckpt").toString
    val cents = Seq((0L, Array(10.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 10.0, 0.0, 0.0)))
    val seed = (0L until 12L).map(i =>
      (i, if (i % 2 == 0) Seq(10f, (i % 5).toFloat * 0.1f, 0f, 0f)
          else Seq((i % 5).toFloat * 0.1f, 10f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    Writers.partitionedParquet(
      Similarity.quantizeBinary(
        Similarity.assignToCentroids(seed, cents, dim = dim),
        dim = dim)
        .select("vec_id", "embedding", "bvec", "cluster"),
      corpus, Seq("cluster"))
    val centDf = seed.sparkSession.createDataFrame(
      seed.sparkSession.sparkContext.parallelize(cents.map { case (c, v) =>
        org.apache.spark.sql.Row(c, v.toSeq) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.annServeForeachBatch(
      in.toDF().toDF("q_id", "q_vec"), corpus, centDf, results, ckpt,
      k = 3, nProbe = 1, dim = dim)
    try {
      in.addData((100L, Seq(9f, 1f, 0f, 0f)), (101L, Seq(1f, 9f, 0f, 0f)))
      q.processAllAvailable()
      in.addData((200L, Seq(8f, 0f, 1f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    // per-batch directories, exactly the batched probe's rows
    val b0 = spark.read.parquet(s"$results/batch_id=0")
    val b1 = spark.read.parquet(s"$results/batch_id=1")
    assert(b0.select("q_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(100L, 101L))
    assert(b1.select("q_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(200L))
    val expect = Similarity.binaryIvfTopKBatch(spark, corpus, centDf,
        Seq((100L, Seq(9f, 1f, 0f, 0f))).toDF("q_id", "q_vec"),
        k = 3, nProbe = 1, dim = dim)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq.sorted
    val got = b0.filter(col("q_id") === 100L)
      .collect().map(r => (r.getAs[Int]("rk"), r.getAs[Long]("vec_id")))
      .toSeq.sorted
    assert(got == expect, s"$got vs $expect")
    // x-side query's neighbors are x-side vectors (even ids)
    assert(got.forall(_._2 % 2 == 0), s"$got")
  }
}
