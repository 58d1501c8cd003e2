package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, typedlit}
import graft.io.{Readers, Writers}

/** Sinks: plain, date-partitioned layout, idempotence guard. */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("orc round-trips values; filters push into the ORC scan") {
    val dir = Files.createTempDirectory("graft_orc").resolve("out").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "k", "v")
    Writers.orc(df, dir)
    val back = Readers.readOrc(spark, dir)
    assert(back.orderBy("id").collect().map(_.getDouble(2)).toSeq ==
      Seq(10.0, 20.0, 30.0))
    // the columnar contract: predicates reach the ORC scan itself
    val plan = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(id,1)"), s"filter not pushed:\n$plan")
  }

  test("shardedTrainingSet: shard dirs, one file per shard, rows in " +
    "shard_order, byte-identical re-run") {
    val dir = Files.createTempDirectory("graft_sh").resolve("out").toString
    val df = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Writers.shardedTrainingSet(df, dir, nShards = 4, seed = "s")
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 4, s"expected 4 shard dirs, got " +
      shardDirs.map(_.getName).mkString(","))
    // one writer task per shard → one data file per shard dir
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    // file row order IS the training order: each shard file is sorted
    val one = spark.read.parquet(shardDirs.head.getPath)
    val orders = one.select("shard_order").collect().map(_.getLong(0)).toSeq
    assert(orders == orders.sorted, "shard file not in shard_order")
    // same seed → identical assignment on re-run
    val again = graft.text.TextOps.trainingShards(df, nShards = 4,
      seed = "s").select("doc_id", "shard", "shard_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // partition-dir values are re-inferred as INT on read — cast back
    val first = spark.read.parquet(dir)
      .select($"doc_id", $"shard".cast("long"), $"shard_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == first.toSeq)
    // balance: no shard more than 2x the fair share on 200 uniform keys
    val sizes = first.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.max <= 100, s"skewed shards: $sizes")
  }

  test("shardedTrainingSetWithManifest: per-shard rows/chars/checksum; " +
    "same-seed re-write reproduces identical checksums") {
    val dir = Files.createTempDirectory("graft_shm").resolve("out").toString
    val df = (0L until 120L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Writers.shardedTrainingSetWithManifest(df, dir, nShards = 3, seed = "m")
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    val entries = manifest.split("\n").filter(_.contains("\"shard\""))
    assert(entries.length == 3, s"manifest:\n$manifest")
    // rows sum to the corpus; chars are real (every text is non-empty)
    val rows = entries.map(e =>
      "\"rows\":(\\d+)".r.findFirstMatchIn(e).get.group(1).toLong)
    assert(rows.sum == 120L, s"rows: ${rows.toSeq}")
    assert(entries.forall(_.contains("\"chars\":")) &&
      !manifest.contains("\"chars\":null"))
    // deterministic: a same-seed re-write yields the same manifest
    Writers.shardedTrainingSetWithManifest(df, dir, nShards = 3, seed = "m")
    val manifest2 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    assert(manifest2 == manifest)
    // checksum is order/content-sensitive: a different seed permutes the
    // order, changing at least one shard's checksum
    Writers.shardedTrainingSetWithManifest(df, dir, nShards = 3, seed = "x")
    val manifest3 = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    def sums(m: String): Seq[String] =
      "\"checksum\":(-?\\d+)".r.findAllMatchIn(m).map(_.group(1)).toSeq
    assert(sums(manifest3) != sums(manifest))
  }

  test("partitionedParquet writes partition directories; reads prune by key") {
    val dir = Files.createTempDirectory("graft_w").resolve("out").toString
    val df = Seq(("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3))
      .toDF("date", "v")
    Writers.partitionedParquet(df, dir, Seq("date"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val oneDay = back.filter($"date" === "2024-01-01")
    assert(oneDay.count() == 2)
    // partition pruning: the filter must land in the scan's
    // PartitionFilters (directory-level pruning), not a post-scan Filter
    val plan = oneDay.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*date".r.findFirstIn(plan).isDefined,
      s"date filter not pruning partitions:\n$plan")
    assert(new java.io.File(dir, "date=2024-01-02").exists)
  }

  test("compact rewrites a many-small-files directory into the target " +
    "count, preserving rows; sorted variant clusters by key") {
    val dir = Files.createTempDirectory("graft_compact").resolve("t")
    val df = (1 to 2000).map(i => (i.toLong, i % 7, s"row$i"))
      .toDF("id", "k", "s")
    df.repartition(50).write.parquet(dir.toString)
    def parquetFiles = new java.io.File(dir.toString).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 50)
    val n = Writers.compact(spark, dir.toString, targetFileMB = 512)
    assert(n == 1 && parquetFiles == 1, s"n=$n files=$parquetFiles")
    val back = spark.read.parquet(dir.toString)
    assert(back.count() == 2000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head()
      .getLong(0) == 2000L * 2001 / 2)
    // sorted compaction keeps rows range-clustered within the file
    Writers.compact(spark, dir.toString, targetFileMB = 512,
      sortCols = Seq("id"))
    val ids = spark.read.parquet(dir.toString).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }

  test("compact preserves a hive-partitioned layout — partition dirs " +
    "and pruning survive the rewrite") {
    val dir = Files.createTempDirectory("graft_compact_p").resolve("t")
    val df = (1 to 400).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "dt")
    df.repartition(20).write.partitionBy("dt").parquet(dir.toString)
    Writers.compact(spark, dir.toString, targetFileMB = 512)
    val subdirs = new java.io.File(dir.toString).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(subdirs == Seq("dt=d0", "dt=d1", "dt=d2"), s"got $subdirs")
    val back = spark.read.parquet(dir.toString)
    assert(back.count() == 400)
    // partition pruning still works on the compacted tree
    val plan = back.filter($"dt" === "d1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
  }

  test("parquetMerged unifies drifted schemas and null-backfills old " +
    "files") {
    val dir = Files.createTempDirectory("graft_merge").resolve("t")
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir.toString)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir.toString)
    val merged = graft.io.Readers.parquetMerged(spark, dir.toString)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("jsonl sink round-trips, gzip parts carry the codec extension") {
    val plain = Files.createTempDirectory("graft_jl").resolve("p").toString
    val gz = Files.createTempDirectory("graft_jl").resolve("g").toString
    val df = Seq((1L, "a \"quoted\" line"), (2L, "b\nnewline"))
      .toDF("id", "text")
    Writers.jsonl(df.repartition(1), plain)
    Writers.jsonl(df.repartition(1), gz, gzip = true)
    val back = spark.read.json(plain).orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("text")))).toSeq
    assert(back == Seq(1L -> "a \"quoted\" line", 2L -> "b\nnewline"))
    val backGz = spark.read.json(gz).count()
    assert(backGz == 2)
    val gzParts = new java.io.File(gz).listFiles()
      .filter(_.getName.startsWith("part")).map(_.getName).toSeq
    assert(gzParts.nonEmpty && gzParts.forall(_.endsWith(".json.gz")),
      s"expected gzip parts, got $gzParts")
  }

  test("parquetIfAbsent is a no-op when output exists (S8)") {
    val dir = Files.createTempDirectory("graft_w2").resolve("out").toString
    Writers.parquetIfAbsent(Seq(1, 2, 3).toDF("v"), dir)
    Writers.parquetIfAbsent(Seq(9).toDF("v"), dir) // ignored
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("bucketedTable join on the bucket key plans without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0L until 200L).map(i => (i % 40, i)).toDF("k", "a")
      val dims = (0L until 40L).map(i => (i, i * 10)).toDF("k", "b")
      Writers.bucketedTable(facts, "bt_facts", Seq("k"), 4,
        sortCols = Seq("k"))
      Writers.bucketedTable(dims, "bt_dims", Seq("k"), 4, sortCols = Seq("k"))
      val joined = spark.table("bt_facts")
        .join(spark.table("bt_dims"), "k")
      val p = joined.queryExecution.sparkPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bt_facts")
      spark.sql("DROP TABLE IF EXISTS bt_dims")
    }
  }

  test("stored signature index: batch path never scans corpus text, " +
    "corpus side plans without an exchange, stored ≡ in-memory " +
    "(VERDICT r9 item 1)") {
    import graft.dedup.Dedup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val corpusDir = Files.createTempDirectory("graft_sigidx")
      .resolve("corpus").toString
    try {
      val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
        "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
      def textOf(i: Long, tail: String): String =
        (0 until 12).map(j => words(((i + j) % 12).toInt))
          .mkString(" ") + " " + tail
      val corpusDocs = (0L until 30L).map(i => (i, textOf(i, "corpus")))
        .toDF("doc_id", "text")
      corpusDocs.write.mode("overwrite").parquet(corpusDir)
      val corpus = spark.read.parquet(corpusDir)
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(corpus, numHashes = 16, bands = 4),
        "sigidx_t", buckets = 4)
      val idx = Dedup.readSignatureIndex(spark, "sigidx_t")
      // batch: doc 100 re-crawls corpus doc 0 verbatim (every band
      // collides — this test gates the PLAN shape; the near-dup S-curve
      // behavior is ExtensionsSpec's), 101 is fresh
      val batch = Seq(
        (100L, textOf(0L, "corpus")),
        (101L, "nothing here resembles the corpus rotation at all since " +
          "every token is distinct from that vocabulary set"))
        .toDF("doc_id", "text")
      val out = Dedup.incrementalNewFuzzyIndexed(batch, idx,
        minJaccard = 0.4, numHashes = 16, bands = 4)
      // gate 1: the prior corpus's parquet (its TEXT) is never scanned
      // on the batch path — only the two digest tables are
      val plan = out.queryExecution.sparkPlan
      val scanned = plan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",") }
      assert(scanned.nonEmpty &&
        scanned.forall(p => !p.contains("corpus")),
        s"batch path re-scans the corpus:\n${scanned.mkString("\n")}")
      // gate 2: no shuffle above the bucketed index scans — the corpus
      // side of every batch join rides its bucketing
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e }
      exchanges.foreach { e =>
        val under = e.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",") }
        assert(under.forall(p => !p.contains("sigidx_t")),
          s"index table shuffles on the batch path:\n$plan")
      }
      // gate 3: stored verdicts ≡ the in-memory index on the same corpus
      val storedKept = out.select("doc_id").collect()
        .map(_.getLong(0)).toSeq.sorted
      val memKept = Dedup.incrementalNewFuzzyIndexed(batch,
          Dedup.buildSignatureIndex(corpus, numHashes = 16, bands = 4),
          minJaccard = 0.4, numHashes = 16, bands = 4)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(storedKept == memKept && storedKept == Seq(101L),
        s"stored $storedKept vs mem $memKept")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS sigidx_t_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_t_bands")
    }
  }

  test("stored gram index: the incremental EXACT-substring gate drops " +
    "a shifted-span batch doc on one aligned gram hit, passes fresh " +
    "and short docs, append grows the state, no index-side exchange") {
    import graft.dedup.Dedup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = "the quick brown fox jumps over the lazy dog while " +
        "ninety nine red balloons drift past the old stone tower at " +
        "dawn and the river bends slowly through the quiet green valley"
      val corpus = Seq((1L, base)).toDF("doc_id", "text")
      Dedup.writeGramIndex(Dedup.buildGramIndex(corpus, minLen = 40),
        "gramidx_t", buckets = 4)
      val fresh = "completely different vocabulary talking about spark " +
        "catalyst tungsten codegen shuffles partitions and broadcast " +
        "joins in a distributed analytical query engine"
      val batch = Seq(
        // shifted copy of base chars [30, 110) at offset 5 — ANY offset
        (10L, "XYZab" + base.substring(30, 110) + "Qtail padding here"),
        (11L, fresh),
        (12L, "short doc")) // < minLen: no gram, passes by contract
        .toDF("doc_id", "text")
      val out = Dedup.incrementalNewExactSubstr(batch, "gramidx_t",
        minLen = 40)
      // index side of the probe join never exchanges (bucketed by h)
      val exchanges = out.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e }
      exchanges.foreach { e =>
        val under = e.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",") }
        assert(under.forall(pth => !pth.contains("gramidx_t")),
          s"index shuffles on the batch path")
      }
      val kept = out.select("doc_id").collect()
        .map(_.getLong(0)).toSeq.sorted
      assert(kept == Seq(11L, 12L), s"kept $kept")
      // land + append the survivors; a later batch near-copying the
      // SURVIVOR is now caught — state lives in the stored table
      Dedup.appendToGramIndex(out, "gramidx_t", buckets = 4,
        minLen = 40)
      val sailing = "yet another disjoint vocabulary about sailing " +
        "boats on the wide open sea under grey skies full of wheeling " +
        "gulls"
      val batch2 = Seq(
        (20L, "PREFIXZZ " + fresh.substring(10, 95) + " SUFFIX"),
        (21L, sailing),
        // intra-batch keep-first: doc 22 embeds >= 40 chars of doc 21 —
        // neither is in the stored index yet, so only the within-batch
        // self-gate can catch it, and it drops the HIGHER id
        (22L, "QQ" + sailing.substring(20, 80) + "ZZ trailing words"))
        .toDF("doc_id", "text")
      val kept2 = Dedup.incrementalNewExactSubstr(batch2, "gramidx_t",
          minLen = 40)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(kept2 == Seq(21L), s"kept2 $kept2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS gramidx_t_grams")
    }
  }

  test("gram index lifecycle: removeFromGramIndex stops a retracted " +
    "doc's grams from gating a re-submitted twin; compactGramIndex " +
    "makes the removal physical, folds append files, keeps the bucket " +
    "spec and the exchange-free probe plan; tombstones cleared") {
    import graft.dedup.Dedup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = "the quick brown fox jumps over the lazy dog while " +
        "ninety nine red balloons drift past the old stone tower at " +
        "dawn and the river bends slowly onward"
      val b = "completely different vocabulary talking about spark " +
        "catalyst tungsten codegen shuffles partitions and broadcast " +
        "joins in a distributed analytical query engine"
      val c = "a third disjoint corpus about sailing boats on the " +
        "wide open sea under grey skies full of wheeling gulls and " +
        "distant lighthouses blinking through fog"
      Dedup.writeGramIndex(
        Dedup.buildGramIndex(Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
          minLen = 40), "gramidx_rc", buckets = 4)
      // one append so compaction has per-batch files to fold
      Dedup.appendToGramIndex(Seq((3L, c)).toDF("doc_id", "text"),
        "gramidx_rc", buckets = 4, minLen = 40)
      def gate(rows: Seq[(Long, String)]): Seq[Long] =
        Dedup.incrementalNewExactSubstr(rows.toDF("doc_id", "text"),
            "gramidx_rc", minLen = 40)
          .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      val twinA = (50L, "ZZ" + a.substring(5, 70) + " QQ tail words")
      val twinB = (51L, "YY" + b.substring(10, 75) + " PP other tail")
      val twinC = (52L, "XX" + c.substring(8, 72) + " RR more words")
      assert(gate(Seq(twinA, twinB, twinC)) == Seq.empty)
      // retract doc 1: its twin is NEW data again, immediately (the
      // tombstone-aware read — no compaction needed); docs 2/3 still gate
      Dedup.removeFromGramIndex(Seq(1L).toDF("doc_id"), "gramidx_rc")
      assert(gate(Seq(twinA, twinB, twinC)) == Seq(50L))
      // compact: tombstoned grams physically gone, tombstones cleared,
      // bucket spec preserved, appended doc 3 still present
      val kept = Dedup.compactGramIndex(spark, "gramidx_rc")
      assert(kept > 0)
      assert(!spark.catalog.tableExists("gramidx_rc_gram_tombstones"))
      assert(spark.table("gramidx_rc_grams")
        .filter(col("id") === 1L).count() == 0)
      val buckets = spark.sql("DESCRIBE FORMATTED gramidx_rc_grams")
        .filter(col("col_name") === "Num Buckets")
        .head().getString(1).trim.toInt
      assert(buckets == 4)
      // post-compaction behavior identical: twinA passes, twinB/C gate
      assert(gate(Seq(twinA, twinB, twinC)) == Seq(50L))
      // the compacted index still probes without an index-side exchange
      val out = Dedup.incrementalNewExactSubstr(
        Seq(twinB).toDF("doc_id", "text"), "gramidx_rc", minLen = 40)
      val exchanges = out.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e }
      exchanges.foreach { e =>
        val under = e.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",") }
        assert(under.forall(pth => !pth.contains("gramidx_rc")),
          s"compacted index shuffles on the batch path")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS gramidx_rc_grams")
      spark.sql("DROP TABLE IF EXISTS gramidx_rc_gram_tombstones")
      spark.sql("DROP TABLE IF EXISTS gramidx_rc_grams_compact_tmp")
      spark.sql("DROP TABLE IF EXISTS gramidx_rc_grams_compact_bak")
    }
  }

  test("appendToSignatureIndex closes the continuous-crawl loop: " +
    "batch-2 near-dups of batch-1 survivors are caught by the grown " +
    "index, and the appended join still plans without an exchange") {
    import graft.dedup.Dedup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpusText = "alpha bravo charlie delta echo foxtrot golf " +
        "hotel india juliet kilo lima mike november oscar papa"
      val freshText = "quebec romeo sierra tango uniform victor " +
        "whiskey xray yankee zulu one two three four five six"
      val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(corpus, numHashes = 16, bands = 4),
        "sigidx_app", buckets = 4)
      def gate(batch: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalNewFuzzyIndexed(batch,
          Dedup.readSignatureIndex(spark, "sigidx_app"),
          minJaccard = 0.5, numHashes = 16, bands = 4)
      // batch 1: one corpus re-crawl (dropped) + one fresh doc (kept)
      val batch1 = Seq((10L, corpusText), (11L, freshText))
        .toDF("doc_id", "text")
      val kept1 = gate(batch1)
      assert(kept1.select("doc_id").collect().map(_.getLong(0)).toSeq ==
        Seq(11L))
      Dedup.appendToSignatureIndex(kept1, "sigidx_app", buckets = 4,
        numHashes = 16, bands = 4)
      // batch 2: a re-crawl of batch 1's SURVIVOR — only the grown
      // index can catch it — plus a genuinely new doc
      val batch2 = Seq((20L, freshText),
        (21L, "gamma words entirely distinct from either earlier " +
          "vocabulary set spoken anywhere in the running corpus today"))
        .toDF("doc_id", "text")
      val kept2 = gate(batch2)
      assert(kept2.select("doc_id").collect().map(_.getLong(0)).toSeq ==
        Seq(21L))
      // the appended (two-file-group) tables still bucket their joins
      val plan = kept2.queryExecution.sparkPlan
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.foreach { e =>
        val under = e.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",") }
        assert(under.forall(p => !p.contains("sigidx_app")),
          s"appended index shuffles on the batch path:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS sigidx_app_sigs")
      spark.sql("DROP TABLE IF EXISTS sigidx_app_bands")
    }
  }

  test("signature-index lifecycle: a tombstoned doc stops suppressing " +
    "its near-dups; compaction collapses append-era files, keeps the " +
    "bucket spec (no exchange), and makes removals physical") {
    import graft.dedup.Dedup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpusText = "alpha bravo charlie delta echo foxtrot golf " +
        "hotel india juliet kilo lima mike november oscar papa"
      val otherText = "quebec romeo sierra tango uniform victor " +
        "whiskey xray yankee zulu one two three four five six"
      val corpus = Seq((1L, corpusText), (2L, otherText))
        .toDF("doc_id", "text")
      Dedup.writeSignatureIndex(
        Dedup.buildSignatureIndex(corpus, numHashes = 16, bands = 4),
        "sigidx_lc", buckets = 4)
      def gate(batch: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalNewFuzzyIndexed(batch,
          Dedup.readSignatureIndex(spark, "sigidx_lc"),
          minJaccard = 0.5, numHashes = 16, bands = 4)
          .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      val recrawl = Seq((10L, corpusText)).toDF("doc_id", "text")
      assert(gate(recrawl) == Seq(), "re-crawl should be suppressed")
      // retract doc 1: its re-crawl is NEW data again, doc 2 still gates
      Dedup.removeFromSignatureIndex(Seq(1L).toDF("doc_id"), "sigidx_lc")
      assert(gate(recrawl) == Seq(10L),
        "tombstoned doc still suppresses its re-crawl")
      assert(gate(Seq((11L, otherText)).toDF("doc_id", "text")) == Seq(),
        "untouched doc stopped gating after an unrelated tombstone")
      // grow the index with several appends, then compact
      (0 until 3).foreach { b =>
        Dedup.appendToSignatureIndex(
          Seq((100L + b, s"batch$b specific words nobody else uses " +
            s"round$b extra$b tokens$b here$b now$b")).toDF(
            "doc_id", "text"),
          "sigidx_lc", buckets = 4, numHashes = 16, bands = 4)
      }
      def dataFiles(table: String): Int = {
        val loc = spark.sql(s"DESCRIBE FORMATTED $table")
          .filter(col("col_name") === "Location")
          .head().getString(1)
        val dir = new java.io.File(new java.net.URI(loc))
        Option(dir.listFiles()).map(_.count(f =>
          f.isFile && !f.getName.startsWith("_"))).getOrElse(0)
      }
      val before = dataFiles("sigidx_lc_bands")
      val keptBefore = gate(recrawl) // == Seq(10L), index view pre-compact
      val (nSigs, nBands) = Dedup.compactSignatureIndex(spark, "sigidx_lc")
      assert(nSigs == 4 && nBands == 16, s"kept ($nSigs, $nBands)")
      val after = dataFiles("sigidx_lc_bands")
      assert(after < before,
        s"compaction did not collapse files: $before -> $after")
      assert(!spark.catalog.tableExists("sigidx_lc_tombstones"),
        "tombstones must clear once removals are physical")
      // verdicts unchanged by compaction, and the plan keeps its shape
      assert(gate(recrawl) == keptBefore)
      val out = Dedup.incrementalNewFuzzyIndexed(recrawl,
        Dedup.readSignatureIndex(spark, "sigidx_lc"),
        minJaccard = 0.5, numHashes = 16, bands = 4)
      out.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.foreach { e =>
        val under = e.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",") }
        assert(under.forall(p => !p.contains("sigidx_lc")),
          "compacted index shuffles on the batch path")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("sigidx_lc_sigs", "sigidx_lc_bands", "sigidx_lc_tombstones",
        "sigidx_lc_sigs_compact_tmp", "sigidx_lc_bands_compact_tmp")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("IVF stored index: probed query statically prunes the corpus " +
    "partitions (VERDICT r2 item 8)") {
    import graft.ml.Similarity
    val dim = 4
    // 3 well-separated clusters of 8 vectors each along distinct axes
    val vecs = (0 until 24).map { i =>
      val c = i % 3
      val base = Array.fill(dim)(0.0f)
      base(c) = 10f
      base((c + 1) % dim) = (i / 3).toFloat * 0.1f
      (i.toLong, base.toSeq)
    }
    val embs = vecs.toDF("vec_id", "embedding")
    val assigned = Similarity.kmeans(embs, k = 3, iters = 3, dim = dim)
    val centroids = Similarity.ivfIndex(assigned, "cluster")
    val dirPath = Files.createTempDirectory("graft_ivf").resolve("corpus")
      .toString
    // the stored layout: one directory per cluster
    Writers.partitionedParquet(
      assigned.select("vec_id", "embedding", "cluster"), dirPath,
      Seq("cluster"))
    val q = typedlit(vecs.head._2.map(_.toDouble))
    val served = Similarity.ivfTopKStored(spark, dirPath, centroids, q,
      k = 5, nProbe = 2, dim = dim)
    // plan-time pruning: the probe ids are literals, so the scan's
    // PartitionFilters carry them (no runtime/DPP machinery involved)
    val scan = served.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters on the corpus scan:\n$scan")
    val got = served.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the "number of partitions read" metric proves 2 of the 3 cluster
    // directories were actually opened
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(2L),
      s"expected 2 of 3 cluster dirs scanned; metrics=${scan.metrics}")
    // and the served result matches the in-memory index path
    val inMem = Similarity.ivfTopKWithIndex(assigned, centroids, q,
      k = 5, clusterCol = "cluster", nProbe = 2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == inMem, s"stored-index result diverged: $got vs $inMem")
  }

  test("binary IVF stored: precomputed codes probe with static " +
    "partition pruning AND column pruning (the binary stage never " +
    "reads the float column); result equals the in-memory composition; " +
    "a code-less corpus is rejected by name") {
    import graft.ml.Similarity
    val dim = 4
    val vecs = (0 until 24).map { i =>
      val c = i % 3
      val base = Array.fill(dim)(0.0f)
      base(c) = 10f
      base((c + 1) % dim) = (i / 3).toFloat * 0.1f - 0.2f
      (i.toLong, base.toSeq)
    }
    val embs = vecs.toDF("vec_id", "embedding")
    val assigned = Similarity.kmeans(embs, k = 3, iters = 3, dim = dim)
    val centroids = Similarity.ivfIndex(assigned, "cluster")
    val dirPath = Files.createTempDirectory("graft_bivf")
      .resolve("corpus").toString
    // the stored layout carries the PRECOMPUTED sign-bit codes
    Writers.partitionedParquet(
      Similarity.quantizeBinary(assigned, dim = dim)
        .select("vec_id", "embedding", "bvec", "cluster"),
      dirPath, Seq("cluster"))
    val q = vecs.head._2.map(_.toDouble).toArray
    val served = Similarity.binaryIvfTopKStored(spark, dirPath,
      centroids, q, k = 4, nProbe = 2, rerankK = 8, dim = dim)
    val got = served.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // parity with the in-memory composition on the same inputs
    val inMem = Similarity.binaryIvfTopK(assigned, q, 4, "cluster",
        nProbe = 2, rerankK = 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == inMem, s"stored diverged: $got vs $inMem")
    // the query's own vector is the top hit
    assert(got.head._1 == 0L, s"got $got")
    // static pruning + column pruning, read off the FINAL plan (the
    // collect above finalized AQE): every corpus scan carries the
    // literal cluster partition filter, and the binary-stage scan's
    // ReadSchema holds the codes WITHOUT the float column
    val planStr = served.queryExecution.executedPlan.toString
    val scanLines = planStr.split('\n')
      .filter(l => l.contains("FileScan parquet") ||
        l.contains("PartitionFilters"))
    assert(planStr.contains("PartitionFilters: [cluster"),
      s"no static cluster pruning:\n$planStr")
    val binaryScan = planStr.split('\n')
      .filter(l => l.contains("ReadSchema") && l.contains("bvec"))
    assert(binaryScan.exists(!_.contains("embedding")),
      s"binary stage reads the float column:\n${scanLines.mkString("\n")}")
    // a corpus written WITHOUT codes fails descriptively
    val bare = Files.createTempDirectory("graft_bivf2")
      .resolve("corpus").toString
    Writers.partitionedParquet(
      assigned.select("vec_id", "embedding", "cluster"), bare,
      Seq("cluster"))
    val e = intercept[IllegalArgumentException] {
      Similarity.binaryIvfTopKStored(spark, bare, centroids, q,
        k = 4, dim = dim)
    }
    assert(e.getMessage.contains("bvec"), s"got ${e.getMessage}")
    // packSignBits parity with the column kernel
    val packed = Similarity.quantizeBinary(embs, dim = dim)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Long](2))
    vecs.zip(packed).foreach { case ((_, v), words) =>
      assert(Similarity.packSignBits(v.map(_.toDouble).toArray) ==
        words.toSeq)
    }
    // schema-aware append: a CODE-LESS batch appended to the coded
    // corpus is quantized automatically and the probe serves it
    val cents = centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val fresh = Seq((200L, Seq(10.1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(dirPath, fresh, cents, dim = dim)
    val afterAppend = Similarity.binaryIvfTopKStored(spark, dirPath,
        centroids, q, k = 4, nProbe = 2, rerankK = 8, dim = dim)
      .collect().map(_.getLong(0)).toSeq
    assert(afterAppend.contains(200L),
      s"appended vector not served: $afterAppend")
  }

  test("binaryIvfTopKBatch: every query's rows equal the one-query " +
    "stored probe run separately; the probed-cluster union is read " +
    "once") {
    import graft.ml.Similarity
    val dim = 4
    val vecs = (0 until 24).map { i =>
      val c = i % 3
      val base = Array.fill(dim)(0.0f)
      base(c) = 10f
      base((c + 1) % dim) = (i / 3).toFloat * 0.1f - 0.2f
      (i.toLong, base.toSeq)
    }
    val embs = vecs.toDF("vec_id", "embedding")
    val assigned = Similarity.kmeans(embs, k = 3, iters = 3, dim = dim)
    val centroids = Similarity.ivfIndex(assigned, "cluster")
    val dirPath = Files.createTempDirectory("graft_bivfb")
      .resolve("corpus").toString
    Writers.partitionedParquet(
      Similarity.quantizeBinary(assigned, dim = dim)
        .select("vec_id", "embedding", "bvec", "cluster"),
      dirPath, Seq("cluster"))
    val qs = Seq((0L, vecs(0)._2), (1L, vecs(7)._2), (2L, vecs(14)._2))
    val batch = Similarity.binaryIvfTopKBatch(spark, dirPath, centroids,
        qs.toDF("q_id", "q_vec"), k = 4, nProbe = 2, rerankK = 8,
        dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    qs.foreach { case (qid, qv) =>
      val one = Similarity.binaryIvfTopKStored(spark, dirPath,
          centroids, qv.map(_.toDouble).toArray, k = 4, nProbe = 2,
          rerankK = 8, dim = dim)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0),
          r.getDouble(1)) }.toSeq
      assert(batch(qid).toSeq.sortBy(_._2) == one, s"q $qid diverged")
    }
    // plan gate: the batch probe's corpus scans carry the literal
    // cluster partition filter (static pruning survives the batching)
    val served = Similarity.binaryIvfTopKBatch(spark, dirPath,
      centroids, qs.toDF("q_id", "q_vec"), k = 4, nProbe = 2,
      rerankK = 8, dim = dim)
    served.collect()
    val planStr = served.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [cluster"),
      s"no static cluster pruning in the batch probe:\n$planStr")
    // a ZERO-NORM corpus vector reaching the candidate set: batch and
    // stored must stay row-for-row identical — both score it 0.0 via
    // the shared cosine() convention (the batch path previously
    // FILTERED zero-norm rows and returned fewer/different rows than
    // the stored path, breaking the per-query equality claim)
    val cents = centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    Similarity.appendToIvfIndex(dirPath,
      Seq((99L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"),
      cents, dim = dim)
    val batchZ = Similarity.binaryIvfTopKBatch(spark, dirPath,
        centroids, qs.toDF("q_id", "q_vec"), k = 25, nProbe = 3,
        rerankK = 40, dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    qs.foreach { case (qid, qv) =>
      val one = Similarity.binaryIvfTopKStored(spark, dirPath,
          centroids, qv.map(_.toDouble).toArray, k = 25, nProbe = 3,
          rerankK = 40, dim = dim)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0),
          r.getDouble(1)) }.toSeq
      assert(batchZ(qid).toSeq.sortBy(_._2) == one,
        s"q $qid diverged with a zero-norm candidate")
    }
    assert(batchZ.values.flatten.exists(t => t._3 == 99L && t._4 == 0.0),
      "zero-norm vector missing from the batch answer")
  }

  test("IVF stored index lifecycle: append lands only in its clusters, " +
    "served without rebuild, compaction collapses files and keeps " +
    "pruning") {
    import graft.ml.Similarity
    import org.apache.spark.sql.functions.typedlit
    val dim = 4
    val vecs = (0 until 24).map { i =>
      val c = i % 3
      val base = Array.fill(dim)(0.0f)
      base(c) = 10f
      base((c + 1) % dim) = (i / 3).toFloat * 0.1f
      (i.toLong, base.toSeq)
    }
    val embs = vecs.toDF("vec_id", "embedding")
    val assigned = Similarity.kmeans(embs, k = 3, iters = 3, dim = dim)
    val centroidTable = Similarity.ivfIndex(assigned, "cluster")
    val centroids = centroidTable.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val dirPath = Files.createTempDirectory("graft_ivf_lc")
      .resolve("corpus").toString
    Writers.partitionedParquet(
      assigned.select("vec_id", "embedding", "cluster"), dirPath,
      Seq("cluster"))
    def filesPerCluster: Map[String, Int] = {
      val root = new java.io.File(dirPath)
      root.listFiles().filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    }
    val before = filesPerCluster
    // batch: two new vectors near cluster of vec 0 only
    val v0 = vecs.head._2.map(_.toDouble)
    val batch = Seq((100L, v0.map(_ * 1.01f).map(_.toFloat).toSeq),
      (101L, v0.map(_ * 0.99f).map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val report = Similarity.appendToIvfIndex(dirPath, batch, centroids,
      dim = dim).collect()
    // both land in ONE cluster, report says so
    assert(report.length == 1 && report.head.getLong(1) == 2L)
    val hot = report.head.get(0).toString
    val after = filesPerCluster
    // untouched cluster directories gained no files
    before.foreach { case (c, n) =>
      if (c != s"cluster=$hot") assert(after(c) == n,
        s"cold cluster $c rewritten: $n -> ${after(c)}") }
    assert(after(s"cluster=$hot") > before(s"cluster=$hot"))
    // the next probe serves the appended vectors with no rebuild
    val served = Similarity.ivfTopKStored(spark, dirPath, centroidTable,
      typedlit(v0), k = 3, nProbe = 1, dim = dim)
      .collect().map(_.getLong(0)).toSeq
    assert(served.contains(100L) && served.contains(101L))
    // drift gate reads ~zero here (batch mirrors the cluster)
    val drift = Similarity.centroidDrift(
      assigned.select("vec_id", "embedding", "cluster"),
      spark.read.parquet(dirPath), groupCol = "cluster", dim = dim)
      .collect()
    assert(drift.forall(_.getAs[Double]("drift") < 0.2))
    // append x5 then compact: file count collapses, pruning survives
    (0 until 5).foreach { i =>
      val b = Seq((200L + i, v0.map(_ * (1.0 + i * 0.001)).map(_.toFloat)
        .toSeq)).toDF("vec_id", "embedding")
      Similarity.appendToIvfIndex(dirPath, b, centroids, dim = dim)
        .collect()
    }
    val fragmented = filesPerCluster(s"cluster=$hot")
    assert(fragmented >= 6, s"expected fragmentation, got $fragmented")
    // RETRACTION (r14 lifecycle parity with the signature/gram
    // indexes): tombstone one appended vector — the very next probe
    // must not serve it, with NO partition rewritten
    val filesBefore = filesPerCluster
    Similarity.removeFromIvfIndex(spark, dirPath,
      Seq(100L).toDF("vec_id"))
    assert(filesPerCluster == filesBefore,
      "retraction rewrote corpus files")
    val servedRetracted = Similarity.ivfTopKStored(spark, dirPath,
      centroidTable, typedlit(v0), k = 10, nProbe = 1, dim = dim)
    val retractedIds = servedRetracted.collect().map(_.getLong(0)).toSeq
    assert(!retractedIds.contains(100L),
      s"tombstoned vector still served: $retractedIds")
    assert(retractedIds.contains(101L))
    // the tombstone rides a BROADCAST anti-join — the pruned scan's
    // plan shape survives (no shuffle exchange on the corpus side)
    val pR = servedRetracted.queryExecution.executedPlan
    assert(pR.toString.contains("BroadcastHashJoin"),
      s"tombstones not broadcast:\n$pR")
    // compact: files collapse to one per cluster, the removal becomes
    // physical, pruning survives, tombstones are cleared
    val keptRows = Similarity.compactIvfIndex(spark, dirPath)
    val compacted = filesPerCluster
    assert(compacted.values.forall(_ == 1),
      s"compaction did not collapse files: $compacted")
    val allIds = spark.read.parquet(dirPath)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!allIds.contains(100L), "compaction kept a tombstoned row")
    assert(keptRows == allIds.size.toLong)
    assert(!new java.io.File(dirPath + "_tombstones").exists(),
      "tombstone sidecar not cleared")
    val servedAfter = Similarity.ivfTopKStored(spark, dirPath,
      centroidTable, typedlit(v0), k = 3, nProbe = 1, dim = dim)
    val scan = servedAfter.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      "compaction destroyed the partition layout")
    // the compacted probe reads only the probed cluster and no
    // shuffle exchange appears anywhere in the serve plan
    val exchanges = servedAfter.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange
        .ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, "compacted probe shuffles")
    val afterIds = servedAfter.collect().map(_.getLong(0)).toSeq
    assert(!afterIds.contains(100L))
    assert(afterIds.forall(id => id >= 101L || id % 3 == vecs.head._1 % 3))
  }

  test("projected-LSH stored index: driver-side probe set statically " +
    "prunes the bucket partitions; parity with the in-memory path") {
    import graft.ml.Similarity
    val dim = 4
    val outDim = 3
    val planes = 2 // 4 possible buckets, 3 multi-probe ids → pruning
    // deterministic spread of sign patterns so all 4 buckets are hit
    val vecs = (0 until 64).map { i =>
      (i.toLong, (0 until dim).map(j =>
        (((i * 31 + j * 17) % 7) - 3).toDouble / 3.0).toSeq)
    }
    val embs = vecs.toDF("vec_id", "embedding")
    val index = Similarity.projectedLshIndex(embs, outDim, planes,
      dim = dim)
    val bucketsWritten = index.select("bucket").distinct().count()
    assert(bucketsWritten == 4L,
      s"fixture should cover all 4 buckets, hit $bucketsWritten")
    val dirPath = Files.createTempDirectory("graft_plsh")
      .resolve("corpus").toString
    Writers.partitionedParquet(index, dirPath, Seq("bucket"))
    val query = vecs(5)._2.toArray
    val served = Similarity.projectedLshStored(spark, dirPath, query,
      k = 5, outDim = outDim, planes = planes, dim = dim)
    val scan = served.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters on the corpus scan:\n$scan")
    val got = served.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // 3 probe ids against 4 written bucket dirs: at most 3 opened
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.exists(n => n <= 3L && n < bucketsWritten),
      s"expected <= 3 of 4 bucket dirs scanned; metrics=${scan.metrics}")
    val inMem = Similarity.projectedLshTopK(embs, query, k = 5,
      outDim = outDim, planes = planes, dim = dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == inMem, s"stored-index result diverged: $got vs $inMem")
    assert(got.nonEmpty, "probe returned no candidates")
  }

  test("tfrecord shards: every type round-trips through the wire " +
    "format, nulls absent, doubles narrow to float32, CRCs verified " +
    "and corruption detected, manifest counts the shards") {
    import graft.io.Tfrecord
    val dir = Files.createTempDirectory("graft_tfr")
      .resolve("out").toString
    val df = Seq(
      (1L, "alpha", 1.5, Seq(10L, 20L), Seq("x", "y"),
        Array[Byte](1, 2, 3)),
      (2L, null.asInstanceOf[String], 0.25, Seq.empty[Long],
        Seq.empty[String], null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "text", "score", "ids", "tags", "blob")
      .repartition(2, col("doc_id")) // two shards, both non-empty
    val manifest = Tfrecord.writeTfrecordShards(df, dir).collect()
    assert(manifest.map(_.getLong(1)).sum == 2L)
    assert(manifest.forall(_.getString(0).endsWith(".tfrecord")))
    // round-trip: payloads parse back to exactly the written features
    val back = Tfrecord.readRecords(spark, dir).collect()
      .map(r => Tfrecord.parseExample(r.getAs[Array[Byte]]("payload")))
    assert(back.length == 2)
    val byId = back.map { feats =>
      val m = feats.map(f => f._1 -> f).toMap
      (m("doc_id")._3.head, m)
    }.toMap
    val r1 = byId(1L)
    assert(new String(r1("text")._2.head, "UTF-8") == "alpha")
    assert(r1("score")._4 == Seq(1.5f))
    assert(r1("ids")._3 == Seq(10L, 20L))
    assert(r1("tags")._2.map(new String(_, "UTF-8")) == Seq("x", "y"))
    assert(r1("blob")._2.head.toSeq == Seq[Byte](1, 2, 3))
    val r2 = byId(2L)
    assert(!r2.contains("text") && !r2.contains("blob"),
      "null features must be absent")
    assert(r2("score")._4 == Seq(0.25f))
    assert(r2("ids")._3.isEmpty && r2("tags")._2.isEmpty)
    // integrity: flipping one payload byte must fail the CRC check
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(14) = (bytes(14) ^ 0x01).toByte // inside the first payload
    java.nio.file.Files.write(f.toPath, bytes)
    // drop Hadoop's local-FS .crc sidecars so the FORMAT's own CRC
    // (the one that travels with the bytes) is what detects it
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val ex = intercept[Exception] {
      Tfrecord.readRecords(spark, dir).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("CRC")),
      s"no CRC failure in cause chain: $chain")
  }

  test("tfrecord external-compat vectors: CRC-32C pins the published " +
    "check value, the mask is the spec formula, and a known-bytes " +
    "Example matches a hand-derived proto wire encoding") {
    import graft.io.Tfrecord
    // the published CRC-32C check value (Castagnoli polynomial, RFC
    // 3720 appendix): crc32c("123456789") = 0xE3069283 — anchors the
    // polynomial/reflection choices to the external spec
    val check = "123456789".getBytes("UTF-8")
    val crc = new java.util.zip.CRC32C()
    crc.update(check)
    assert(crc.getValue == 0xE3069283L,
      f"crc32c check value mismatch: 0x${crc.getValue}%08X")
    // the TFRecord mask from the published spec applied to that known
    // crc: mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8 (uint32)
    val c = 0xE3069283
    val wantMasked = ((c >>> 15) | (c << 17)) + 0xa282ead8
    assert(Tfrecord.maskedCrc(check) == wantMasked,
      f"masked crc mismatch: 0x${Tfrecord.maskedCrc(check)}%08X")
    // a known-bytes Example, hand-derived from the protobuf wire spec
    // (field tags/varints computed by hand, NOT by our encoder):
    // Example{features(1){feature(1) map entries in field order:
    //   "a" -> Feature{int64_list(3){value(1, packed): [5]}}
    //   "b" -> Feature{bytes_list(1){value(1): "hi"}}}}
    import org.apache.spark.sql.types.{LongType, StringType,
      StructField, StructType}
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val got = Tfrecord.exampleBytes(
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](5L, "hi"), schema), schema)
    val want = Array(
      0x0A, 0x19, // Example.features, 25 bytes
      0x0A, 0x0A, // map entry "a", 10 bytes
      0x0A, 0x01, 0x61, // key "a"
      0x12, 0x05, // value: Feature, 5 bytes
      0x1A, 0x03, // int64_list, 3 bytes
      0x0A, 0x01, 0x05, // packed value [5]
      0x0A, 0x0B, // map entry "b", 11 bytes
      0x0A, 0x01, 0x62, // key "b"
      0x12, 0x06, // value: Feature, 6 bytes
      0x0A, 0x04, // bytes_list, 4 bytes
      0x0A, 0x02, 0x68, 0x69 // value "hi"
    ).map(_.toByte)
    assert(got.toSeq == want.toSeq,
      s"wire bytes diverge:\n got ${got.map("%02X".format(_)).mkString(" ")}" +
        s"\nwant ${want.map("%02X".format(_)).mkString(" ")}")
    // and the frame around it: 8-byte LE length, masked len-crc,
    // payload, masked payload-crc — lengths/offsets per the spec
    val frame = Tfrecord.framed(got)
    assert(frame.length == 8 + 4 + got.length + 4)
    val lenField = java.util.Arrays.copyOfRange(frame, 0, 8)
    assert(java.nio.ByteBuffer.wrap(lenField)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong == got.length.toLong)
    assert(java.nio.ByteBuffer.wrap(frame, 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt ==
      Tfrecord.maskedCrc(lenField))
    assert(java.nio.ByteBuffer.wrap(frame, 12 + got.length, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt ==
      Tfrecord.maskedCrc(got))
  }

  test("webdataset tar shards: members round-trip bit for bit, null " +
    "members absent, REAL GNU tar lists and extracts the shard, " +
    "manifest counts members") {
    import graft.io.WebDataset
    val dir = Files.createTempDirectory("graft_wds")
      .resolve("out").toString
    val df = Seq(
      ("s1", Array[Byte](9, 8, 7), "{\"w\": 3}", "alpha"),
      ("s2", Array[Byte](1), null.asInstanceOf[String], "beta"))
      .toDF("key", "bin", "json", "txt")
      .coalesce(1) // one shard → deterministic member order
    val manifest = WebDataset.writeWebDatasetShards(df, dir).collect()
    assert(manifest.length == 1)
    assert(manifest.head.getLong(1) == 2L) // samples
    assert(manifest.head.getLong(2) == 5L) // members (one json null)
    // our reader: every member back bit-for-bit, sample-adjacent
    val back = WebDataset.readMembers(spark, dir).collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toList
    assert(back.map(_._1) ==
      List("s1.bin", "s1.json", "s1.txt", "s2.bin", "s2.txt"))
    val bk = back.toMap
    assert(bk("s1.bin").toSeq == Seq[Byte](9, 8, 7))
    assert(new String(bk("s1.json"), "UTF-8") == "{\"w\": 3}")
    assert(new String(bk("s2.txt"), "UTF-8") == "beta")
    // external compatibility: the system GNU tar must list the same
    // members and extract identical bytes
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    import scala.sys.process._
    val listed = Seq("tar", "-tf", shard.getAbsolutePath).!!
      .split("\n").toList
    assert(listed ==
      List("s1.bin", "s1.json", "s1.txt", "s2.bin", "s2.txt"))
    val xdir = Files.createTempDirectory("graft_wds_x").toString
    assert(Seq("tar", "-xf", shard.getAbsolutePath, "-C", xdir).! == 0)
    val extracted = java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(s"$xdir/s1.bin"))
    assert(extracted.toSeq == Seq[Byte](9, 8, 7))
  }

  test("webdataset reader: an EXTERNALLY-produced PAX tar (GNU tar " +
    "--format=pax: 'x' extended headers per member, '5' directories) " +
    "yields only the regular-file members, bytes intact") {
    // Python tarfile and img2dataset default to PAX — real WebDataset
    // drops carry one 'x' PaxHeaders entry per member; emitting those
    // as data members would corrupt the sample stream
    val src = Files.createTempDirectory("graft_paxsrc")
    Files.createDirectory(src.resolve("sub"))
    java.nio.file.Files.write(src.resolve("s1.txt"),
      "alpha".getBytes("UTF-8"))
    java.nio.file.Files.write(src.resolve("s1.bin"),
      Array[Byte](5, 4, 3))
    val dir = Files.createTempDirectory("graft_paxtar").toString
    import scala.sys.process._
    assert(Seq("tar", "--format=pax", "-cf", s"$dir/part-00000.tar",
      "-C", src.toString, "s1.bin", "sub", "s1.txt").! == 0)
    val back = graft.io.WebDataset.readMembers(spark, dir).collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toList
    assert(back.map(_._1) == List("s1.bin", "s1.txt"),
      s"PaxHeaders/dir entries leaked as members: ${back.map(_._1)}")
    val bk = back.toMap
    assert(bk("s1.bin").toSeq == Seq[Byte](5, 4, 3))
    assert(new String(bk("s1.txt"), "UTF-8") == "alpha")
  }
}
