package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.ops.Graph
import graft.text.TextOps

/** Dev tool: scaling evidence for the curation operators. Replicates the
  * sf0.1 documents corpus K times (ids offset, a per-replica token appended
  * so replicas are near- but not exact duplicates) and times the heavy
  * operators at 1x and Kx. Near-linear growth validates the SURVEY.md §9
  * ledger claims (bounded buckets, no hidden quadratic pair blow-up);
  * superlinear growth flags an operator to fix.
  *
  * `sbt "runMain graft.ScaleProbe [K] [opFilter]"` (default 10 — ~50k docs
  * ≈ sf1; opFilter = comma-separated op labels to probe, default all).
  * Each op is timed twice per pass and the MINIMUM recorded — single runs
  * at these sizes swing with GC/host state exactly like Bench measurements
  * (BENCH_NOTES.md), and a scaling RATIO built from two noisy singles
  * compounds the error.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val opFilter: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = base.agg(max("doc_id")).head().getLong(0) + 1
    def replicate(times: Int): DataFrame =
      (0 until times).map { r =>
        base.select((col("doc_id") + lit(r * maxId)).as("doc_id"),
          (if (r == 0) col("text")
           else concat(col("text"), lit(s" replica$r"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)

    // shared timing harness: runs each op against a cached copy of `input`;
    // between ops, drops operator-internal caches then re-materializes the
    // shared input OUTSIDE the next op's timing — clearCache alone would
    // charge the corpus scan+union to whichever op runs next
    def timedSuite(input: DataFrame)(
        allOps: Seq[(String, DataFrame => Long)]): Map[String, Double] = {
      val ops = allOps.filter { case (l, _) =>
        opFilter.isEmpty || opFilter(l) }
      if (ops.isEmpty) return Map.empty
      var d = input.cache()
      d.count()
      val r = ops.zipWithIndex.map { case ((label, f), i) =>
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = f(d)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (t1, n) = once()
        val (t2, _) = once() // min-of-2: see scaladoc
        val dt = math.min(t1, t2)
        println(f"  $label: $dt%.2f s ($n rows)")
        spark.catalog.clearCache()
        if (i < ops.size - 1) { // after the last op there is nothing to prime
          d = input.cache()
          d.count()
        }
        label -> dt
      }.toMap
      spark.catalog.clearCache()
      r
    }

    // round-17: the full shipped-tokenizer-file surface in one column
    // fn — declared Sequence(NFKC, Lowercase) normalizer, an added
    // special, metaspace pre-tokenization, an 8-merge fold, and the
    // byte_fallback OOV respell — built ONCE from a written temp file
    // (the loadTokenizer path users hit), map-only by construction
    lazy val fileTokEncode: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column = {
      import graft.text.TokenizerFiles
      val pth = java.nio.file.Files.createTempFile("graft_probe_tok_",
        ".json")
      pth.toFile.deleteOnExit()
      val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"),
        ("o", "n"), ("e", "r"), ("s", "t"), ("d", "e"))
      val alpha = ('a' to 'z').map(_.toString) :+ "▁"
      val vocab = ((alpha ++ merges.map { case (a, b) => a + b })
        .distinct ++ (0 until 256).map(b => f"<0x$b%02X>")).zipWithIndex
      TokenizerFiles.writeTokenizerJsonBpe(spark, pth.toString, merges,
        vocab, preTokenizer = "metaspace",
        normalizers = Seq("NFKC", "Lowercase"),
        addedTokens = Seq("<|doc|>" -> 500L), byteFallback = true)
      TokenizerFiles.loadTokenizer(spark, pth.toString)
        .asInstanceOf[TokenizerFiles.ColumnTokenizer].encode
    }

    def suite(docs: DataFrame): Map[String, Double] =
      timedSuite(docs)(Seq(
        "exact" -> { d => Dedup.exact(d).count() },
        "normalized" -> { d => Dedup.normalized(d).count() },
        "minhash_lsh" -> { d => Dedup.minhashCandidates(d).count() },
        "simhash" -> { d => Dedup.simhashCandidates(d).count() },
        "ngram_jaccard_df1000" -> { d =>
          Dedup.ngramJaccard(d, minJaccard = 0.4, maxDf = 1000).count() },
        // exact any-offset span mining: map cost = one md5 per char;
        // pair volume is DUPLICATION DENSITY by definition — replicas
        // share their whole prefix, so the Kx corpus has K(K-1)/2
        // same-base pairs each contributing a maximal span row (the
        // output-bound regime of ngram_jaccard/imageNearDup, declared)
        "exact_substr" -> { d =>
          Dedup.exactSubstrSpans(
            d.select(col("doc_id"),
              substring(col("text"), 1, 200).as("text")),
            minLen = 60).count() },
        // the CAPPED regime: every doc = a UNIQUE 96-char md5 body +
        // the SAME ~110-char boilerplate footer — the footer is genuine
        // ALL-PAIRS duplication (N(N-1)/2 ≈ 1.2e9 pairs at 10x), the
        // exact corpus-boilerplate class the df cap exists to drop.
        // Pure-footer 60-grams carry df = |corpus| >> 1000 and are
        // anti-joined away BEFORE the self-join; the only surviving
        // witnesses are body/footer BOUNDARY grams, whose df is the
        // count of docs sharing a body hex suffix (5000/16^k) — and as
        // N grows, deeper boundary grams cross the cap too, so the
        // emitted span rows grow ~6x while raw pair volume grows 100x
        // (measured 781k -> 4.9M rows, 1.6x wall at 10x docs): the cap
        // bounds pair volume ADAPTIVELY, the documented recall trade on
        // >maxDf boilerplate
        "exact_substr_hotcap" -> { d =>
          val footer = " subscribe to our newsletter for updates terms" +
            " of service privacy policy all rights reserved copyright" +
            " notice twenty twenty six"
          Dedup.exactSubstrSpans(
            d.select(col("doc_id"),
              concat(md5(col("doc_id").cast("string")),
                md5((col("doc_id") + 7).cast("string")),
                md5((col("doc_id") + 13).cast("string")),
                lit(footer)).as("text")),
            minLen = 60).count() },
        // reference-LM perplexity scoring: LM trained on the even
        // half, odd half scored — two vocab-sized aggs + the pair join
        "lm_ppl_ref" -> { d =>
          val lm = graft.text.TextOps.bigramLmTrain(
            d.filter(col("doc_id") % 2 === 0))
          graft.text.TextOps.bigramNllRef(
            d.filter(col("doc_id") % 2 === 1), lm).count() },
        // full unigram trainer, two EM rounds to a 60-piece target —
        // everything after the word-frequency agg is vocabulary-sized,
        // so the window must be near-FLAT at 10x docs
        "unigram_train2" -> { d =>
          graft.text.TextOps.unigramTrain(d, targetVocab = 60,
            rounds = 2).count() },
        "cc_clusters" -> { d =>
          val pairs = Dedup.ngramJaccard(d, minJaccard = 0.4, maxDf = 1000)
          Dedup.connectedComponents(d.select(col("doc_id").as("id")), pairs)
            .count() },
        // the DISTRIBUTED fallback on the same graph: driverMaxEdges=0
        // forces the BSP label-propagation loop past the union-find
        // gate, so the path production hits beyond 2M edges carries its
        // own 10x evidence (replica components are star-shaped near-dup
        // clusters — diameter stays small, so the round count is flat
        // and the cost per round is the edge-join shuffle)
        "cc_clusters_bsp" -> { d =>
          val pairs = Dedup.ngramJaccard(d, minJaccard = 0.4, maxDf = 1000)
          val n = Dedup.connectedComponents(d.select(col("doc_id").as("id")),
            pairs, driverMaxEdges = 0).count()
          println(s"    cc_clusters_bsp rounds=${Dedup.lastBspRounds.get}")
          n },
        "neardup_pipeline" -> { d =>
          Dedup.nearDupClusters(d, minJaccard = 0.4).count() },
        "tfidf_top3" -> { d => TextOps.tfidfTopTerms(d, k = 3).count() },
        "decontaminate" -> { d =>
          val split = d.withColumn("s", TextOps.hashSplit(col("doc_id")))
          TextOps.decontaminate(split.filter(col("s") === "train"),
            split.filter(col("s") === "test"), n = 8).count() },
        "bloom_decontaminate" -> { d =>
          val split = d.withColumn("s", TextOps.hashSplit(col("doc_id")))
          TextOps.bloomDecontaminate(split.filter(col("s") === "train"),
            split.filter(col("s") === "test"), n = 8).count() },
        "chunk_tokens" -> { d => TextOps.chunkTokens(d).count() },
        "frequent_tokens" -> { d =>
          TextOps.frequentTokens(d, maxMapSize = 1024).count() },
        "bm25_top100" -> { d =>
          TextOps.bm25TopK(d, Seq("spark", "window", "dup"),
            k = 100).count() },
        "adaptive_gate" -> { d => TextOps.adaptiveQualityGate(d).count() },
        "token_entropy" -> { d =>
          // head(), not count(): count(1) above the agg lets Catalyst
          // prune sum(e) and the kernel out of the plan entirely
          d.select(TextOps.tokenEntropy(col("text")).as("e"))
            .agg(sum("e")).head(); 1L },
        "weighted_sample" -> { d =>
          TextOps.weightedSample(d, col("n_chars"), k = 100).count() },
        "ks_distance" -> { d =>
          graft.ops.Stats.ksDistance(d, "source", "n_chars")
            .agg(sum("ks")).head(); 1L },
        "split_leakage" -> { d => Dedup.splitLeakage(d).count() },
        "boilerplate" -> { d =>
          Dedup.duplicatedShingleFraction(d)
            .agg(sum("dup_fraction")).head(); 1L },
        "bigram_nll" -> { d =>
          TextOps.bigramNll(d).agg(sum("nll")).head(); 1L },
        "token_novelty" -> { d =>
          TextOps.tokenNovelty(d).agg(sum("n_novel")).head(); 1L },
        "nucleus_vocab" -> { d =>
          TextOps.nucleusVocab(d, p = 0.9, groupCol = "lang")
            .agg(sum("cum")).head(); 1L },
        "intradoc_dedup" -> { d =>
          Dedup.dedupChunksWithinDoc(d).agg(sum("kept_chunks")).head(); 1L },
        "winsorize" -> { d =>
          graft.ops.Stats.winsorize(d, Seq("source"), "n_chars")
            .agg(sum("clipped")).head(); 1L },
        "budget_select" -> { d =>
          // budget far above the corpus total so selection never truncates
          // the scan — measures the full bin-decomposed pipeline
          TextOps.selectUnderTokenBudget(d, budgetTokens = 10000000000L)
            .agg(sum("cum_tokens")).head(); 1L },
        "substring_dedup" -> { d =>
          // replicas share nearly every 32-char chunk with their source
          // doc, so the duplicate table at Kx approaches the full distinct
          // chunk domain — the broadcast path's worst realistic case
          Dedup.substringDedup(d).agg(sum("kept_chunks")).head(); 1L },
        "hash_features" -> { d => TextOps.hashFeatures(d).count() },
        "training_shards" -> { d =>
          // aggregate the hash outputs so the projection can't be pruned
          // (max, not sum: 60-bit draws summed over the corpus overflow)
          TextOps.trainingShards(d)
            .agg(sum("shard"), max("shard_order")).head(); 1L },
        "k_anonymity" -> { d =>
          graft.ops.Quality.kAnonymity(
            d.withColumn("len_bin", expr("n_chars div 100")),
            Seq("lang", "source", "len_bin")).head(); 1L },
        "script_profile" -> { d =>
          TextOps.scriptProfile(d)
            .agg(sum("latin"), sum("digit")).head(); 1L },
        "compression_ratio" -> { d =>
          d.select(TextOps.compressionRatio(col("text")).as("r"))
            .agg(sum("r")).head(); 1L },
        "html_extract" -> { d =>
          // wrap each doc in markup so the strip chain has work to do;
          // aggregate the output length so nothing prunes
          d.select(TextOps.htmlExtract(concat(
              lit("<html><body><p>"), col("text"),
              lit(" &amp; co</p><!-- c --></body></html>"))).as("t"))
            .agg(sum(length(col("t")))).head(); 1L },
        "gopher_rules" -> { d =>
          TextOps.gopherRules(d)
            .agg(sum("n_words"), sum("pass")).head(); 1L },
        // script-dispatched battery: same map-only strip-and-measure
        // class, plus the dominant-script dispatch expressions
        "script_gates" -> { d =>
          TextOps.gopherRulesScripted(d)
            .agg(sum("n_words"), sum("pass")).head(); 1L },
        // r13 scripted trio: sentence/repetition are map-only over the
        // kernel dominant dispatch; boilerplate adds the q113-style
        // shingle df aggregation (the only shuffle)
        "script_sentences" -> { d =>
          TextOps.sentenceStatsScripted(d)
            .join(d.select(col("doc_id"),
              TextOps.duplicateNgramFractionScripted(col("text"), 3)
                .as("rep3")), Seq("doc_id"))
            .agg(sum("n_sentences"), sum("rep3")).head(); 1L },
        "script_boilerplate" -> { d =>
          graft.dedup.Dedup.duplicatedShingleFractionScripted(d)
            .agg(sum("n_duplicated")).head(); 1L },
        // DSIR: one token pass into the (doc, bucket) table, two
        // |buckets|-row broadcast models — must grow with the scan
        "dsir_weights" -> { d =>
          TextOps.dsirWeights(
              d.filter(col("doc_id") % 11 =!= 0),
              d.filter(col("doc_id") % 11 === 0), numBuckets = 64)
            .agg(sum("n_tokens"), sum("weight")).head(); 1L },
        // r13 batteries: code/markdown are map-only scans; the loss
        // audit is ONE map-side-combined agg keyed by doc id over the
        // 8-step synthesized telemetry (8x input rows by design)
        "code_quality" -> { d =>
          TextOps.codeQualityRules(d)
            .agg(sum("pass"), sum("max_line_len"), sum("alnum_frac"))
            .head(); 1L },
        "markdown_stats" -> { d =>
          TextOps.markdownStats(d)
            .agg(sum("n_headers"), sum("is_markdown")).head(); 1L },
        "loss_trajectories" -> { d =>
          val tele = d.select(col("doc_id"),
              explode(sequence(lit(0), lit(7))).as("step"))
            .select(col("doc_id"), col("step"),
              (lit(3000) - col("step") * 200 +
                pmod(col("doc_id"), lit(37)) * 10 -
                pmod(col("doc_id") * (col("step") + 1), lit(5)) * 100)
                .cast("long").as("loss_milli"))
          graft.ops.Training.lossTrajectories(tele)
            .groupBy("verdict").count().collect(); 1L },
        // TFRecord export: per-row protobuf encode + one sequential
        // shard write per task, then the CRC-verified read-back —
        // pure per-row codec work, must scale with the scan
        "tfrecord_roundtrip" -> { d =>
          val dir = java.nio.file.Files
            .createTempDirectory("graft_tfr_probe").toString + "/out"
          graft.io.Tfrecord.writeTfrecordShards(
            d.select(col("doc_id"), col("text"), col("source")), dir)
          val n = graft.io.Tfrecord.readRecords(d.sparkSession, dir)
            .count()
          org.apache.hadoop.fs.FileSystem.getLocal(
              d.sparkSession.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(dir), true)
          n },
        // WebDataset export: per-member ustar encode + one sequential
        // tar stream per task, then the checksum-verified read-back
        "webdataset_roundtrip" -> { d =>
          val dir = java.nio.file.Files
            .createTempDirectory("graft_wds_probe").toString + "/out"
          graft.io.WebDataset.writeWebDatasetShards(
            d.select(col("doc_id").cast("string").as("key"),
              col("text").as("txt"), col("source").as("cls")), dir)
          val n = graft.io.WebDataset.readMembers(d.sparkSession, dir)
            .count()
          org.apache.hadoop.fs.FileSystem.getLocal(
              d.sparkSession.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(dir), true)
          n },
        // canary lifecycle: inject (map-only fold) + scan (explode ×
        // |spec| then one partial-agged |spec|-row aggregation)
        "canary_scan" -> { d =>
          val spec = Seq("c2" -> 2, "c10" -> 10, "c50" -> 50)
          TextOps.canaryScan(TextOps.injectCanaries(d, spec), spec)
            .agg(sum("n_docs"), sum("n_occurrences")).head(); 1L },
        // CDX planning on index lines whose archive count SCALES with
        // the crawl (constant records per WARC — the production
        // invariant that bounds planFetch's per-filename window) and
        // whose digest dup rate is a constant 50%
        "cdx_fetch_plan" -> { d =>
          val line = concat(lit("com,"), col("source"), lit(")/p"),
            col("doc_id"), lit(" "),
            (lit(20250101000000L) + pmod(col("doc_id"), lit(86400L)))
              .cast("string"),
            lit(" {\"url\": \"https://"), col("source"), lit(".com/p"),
            col("doc_id"),
            lit("\", \"mime\": \"text/html\", \"status\": \""),
            when(col("doc_id") % 5 === 0, lit("404"))
              .otherwise(lit("200")),
            lit("\", \"digest\": \""),
            md5(expr("doc_id div 2").cast("string")),
            lit("\", \"length\": \""), col("n_chars").cast("string"),
            lit("\", \"offset\": \""),
            (col("doc_id") * 1024).cast("string"),
            lit("\", \"filename\": \"crawl-"),
            expr("doc_id div 2048").cast("string"),
            lit(".warc.gz\"}"))
          val recs = d.select(line.as("line"))
            .select(graft.io.Cdx.parsed(col("line")).as("r"))
            .select(col("r.*"))
          graft.io.Cdx.planFetch(graft.io.Cdx.dedupByDigest(recs))
            .agg(sum("fetch_seq"), max("offset")).head(); 1L },
        // deterministic bootstrap: fan-out = models x b x items rows
        // over the replicated corpus as the "eval set" — scales with
        // items by DESIGN (the estimator touches b copies of each)
        "bootstrap_ci" -> { d =>
          val results = d.select(col("doc_id"),
              explode(sequence(lit(0), lit(3))).as("m"))
            .select(concat(lit("model_"), col("m")).as("model"),
              col("doc_id").as("item_id"),
              (pmod(col("doc_id") + col("m") * lit(37L), lit(10L))
                < col("m") + 2).cast("int").as("passed"))
          graft.ops.Chat.bootstrapEvalCI(results, b = 50)
            .agg(sum("accuracy")).head(); 1L },
        "url_normalize" -> { d =>
          // synthesize a noisy URL per doc, normalize + registrable
          // domain (the q139 shape); aggregate so nothing prunes
          val raw = concat(lit("HTTPS://WWW."), col("source"),
            lit(".Example.COM:443/Data//set-"),
            (col("doc_id") % 5).cast("string"),
            lit("/?utm_source=x&id="), col("doc_id").cast("string"),
            lit("#f"))
          d.select(graft.text.UrlOps.normalizeUrl(raw).as("u"))
            .select(graft.text.UrlOps.registeredDomain(
              graft.text.UrlOps.hostOf(col("u"))).as("rd"), col("u"))
            .agg(sum(length(col("u"))), count_distinct(col("rd")))
            .head(); 1L },
        // round-17: normalizer + added-token + byte-fallback encode
        // through a written-then-loaded file; the added special is
        // GLUED in front so the fence regex does real work per row
        "tokenizer_file_encode" -> { d =>
          d.select(concat(lit("<|doc|>"), col("text")).as("t"))
            .select(fileTokEncode(col("t")).as("e"))
            .agg(sum(size(col("e")))).head(); 1L },
        // round-9 additions: node/edge domains SCALE with the corpus
        // (div-derived node ids) so the probe measures the iteration
        // joins, not a fixed 10-node toy
        "pagerank3" -> { d =>
          val n = expr("doc_id div 2")
          val edges = d.select(
            concat(lit("d"), n).as("src"),
            concat(lit("d"), n + (col("doc_id") % 3) + 1).as("dst"))
          graft.ops.Graph.pageRank(edges, iterations = 3)
            .agg(sum("rank")).head(); 1L },
        "bigram_lm_top3" -> { d =>
          TextOps.bigramLm(d, k = 3).agg(sum("n")).head(); 1L },
        "nb_train" -> { d =>
          TextOps.naiveBayesTrain(d, "source")
            .agg(sum("n"), max("smoothed_prob")).head(); 1L },
        "bpe_train3" -> { d =>
          TextOps.bpeTrain(d, numMerges = 3).count() },
        // round-10 additions
        "winnowing_fp" -> { d =>
          d.select(explode(TextOps.winnowingFingerprints(col("text")))
              .as("f"))
            .agg(count(lit(1)), max(col("f.pos"))).head(); 1L },
        // round-11: the xxhash64 internal mode vs portable md5 — same
        // plan, ~5x less hashing per input byte (VERDICT r10 item 5)
        "winnowing_fp_xx" -> { d =>
          d.select(explode(TextOps.winnowingFingerprints(col("text"),
              portable = false)).as("f"))
            .agg(count(lit(1)), max(col("f.pos"))).head(); 1L },
        "cdc_chunks_xx" -> { d =>
          d.select(explode(TextOps.cdcChunks(col("text"),
              portable = false)).as("c"))
            .agg(sum(length(col("c")))).head(); 1L },
        "cdc_chunks" -> { d =>
          d.select(explode(TextOps.cdcChunks(col("text"))).as("c"))
            .agg(sum(length(col("c")))).head(); 1L },
        "cdc_substring_dedup" -> { d =>
          graft.dedup.Dedup.substringDedupCdc(d)
            .agg(sum("kept_chunks")).head(); 1L },
        "winnow_overlap" -> { d =>
          // replicas of one source doc near-dup each other (replica-
          // suffix aside) — the pair families the df cap must bound
          graft.dedup.Dedup.winnowingOverlap(d, minShared = 8,
            maxDf = 50).agg(sum("shared_fps")).head(); 1L },
        "luhn_scan" -> { d =>
          val syn = concat(col("text"), lit(" card 4532"),
            lpad(((col("doc_id") * 7919) % 1000000000000L)
              .cast("string"), 12, "0"))
          d.select(size(TextOps.creditCardScan(syn)).as("n"))
            .agg(sum("n")).head(); 1L },
        "dsir_scores" -> { d =>
          TextOps.dsirScores(d.filter(col("source") =!= "src0"),
            d.filter(col("source") === "src0"))
            .agg(sum("dsir_score")).head(); 1L },
        "pack_greedy" -> { d =>
          TextOps.packSequencesGreedy(d, maxTokens = 512)
            .agg(sum("pack_id"), max("pack_pos")).head(); 1L },
        "pack_bfd" -> { d =>
          TextOps.packSequencesBfd(d, maxTokens = 512)
            .agg(sum("pack_id"), max("pack_pos")).head(); 1L },
        "pack_grouped" -> { d =>
          TextOps.packSequencesGreedy(d, maxTokens = 512,
              groupCol = Some("source"))
            .agg(sum("pack_id"), max("pack_pos")).head(); 1L },
        "pack_similar" -> { d =>
          val assigned = d.select(col("doc_id"),
            (col("doc_id") % 16).cast("int").as("cluster"),
            transform(sequence(lit(1), lit(64)),
              i => ((col("doc_id") % 16) * i % 13).cast("double"))
              .as("embedding"))
          TextOps.packSequencesSimilar(d, assigned, maxTokens = 512)
            .agg(sum("pack_id"), max("pack_pos")).head(); 1L },
        // the DOCUMENT-granular form: same cluster layout plus the
        // bounded per-block NN walk (chainPool² dots per block) — the
        // probe evidence that intra-cluster ordering stays flat at 10x
        "pack_similar_doc" -> { d =>
          val assigned = d.select(col("doc_id"),
            (col("doc_id") % 16).cast("int").as("cluster"),
            transform(sequence(lit(1), lit(64)),
              i => ((col("doc_id") % 16) * i % 13).cast("double"))
              .as("embedding"))
          TextOps.packSequencesSimilar(d, assigned, maxTokens = 512,
              docGranular = true)
            .agg(sum("pack_id"), max("pack_pos")).head(); 1L },
        "pack_manifest" -> { d =>
          TextOps.packManifest(
              TextOps.packSequencesGreedy(d, maxTokens = 512),
              maxTokens = 512)
            .agg(sum("n_docs"), sum(length(col("boundaries"))))
            .head(); 1L },
        "calibration_bins" -> { d =>
          TextOps.calibrationBins(d.select(
            ((col("doc_id") % 129).cast("double") / 128.0).as("prob"),
            (col("doc_id") % 3 === 0).cast("long").as("label")))
            .agg(sum("n")).head(); 1L },
        "chat_stats" -> { d =>
          val words = filter(TextOps.wsTokens(col("text")),
            w => length(w) > 0)
          val turns = filter(
            transform(sequence(lit(0), lit(3)), k =>
              struct(when(k % 2 === 0, lit("user"))
                .otherwise(lit("assistant")).as("role"),
                array_join(slice(words, k * 5 + 1, lit(5)), " ")
                  .as("content"))),
            x => length(x.getField("content")) > 0)
          graft.ops.Chat.conversationStats(
            d.select(col("doc_id"), turns.as("turns")))
            .agg(sum("n_turns"), sum("chars_user")).head(); 1L },
        "bpe_encode8" -> { d =>
          d.select(explode(TextOps.bpeEncode(col("text"),
              Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
                "an" -> "d", "e" -> "r", "o" -> "n", "in" -> "g")))
              .as("w"))
            .agg(sum(length(col("w")))).head(); 1L },
        // production-size merge table on the broadcast-kernel path —
        // the regime where the literal fold is already unusable (4096
        // chained replace nodes): per-word cost is O(len^2) pair
        // lookups independent of |merges|, so the window must scale
        // with corpus size only
        "bpe_encode_kernel4096" -> { d =>
          val spark = d.sparkSession
          val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n",
            "a" -> "n", "an" -> "d", "e" -> "r", "o" -> "n",
            "in" -> "g") ++
            (for { c1 <- "etaoinshrdlucmfwypvbgkjqxz"
                   c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield (c1.toString, c2.toString)) ++
            (1 to 4096).map(i => ("z" + "q" * i) -> "q")
          val bc = TextOps.bpeMergesBroadcast(spark, merges)
          d.select(explode(TextOps.bpeEncodeKernel(col("text"), bc))
              .as("w"))
            .agg(sum(length(col("w")))).head(); 1L },
        // production-32k regime THROUGH THE FILE READER: a GPT-2-format
        // merges.txt of 32,768 lines round-trips TokenizerFiles and
        // feeds the same kernel — compare against bpe_encode_kernel4096
        // at the same corpus: near-equal times are the merge-count
        // independence claim, measured (per-word cost is O(len^2) pair
        // lookups; |merges| only sizes the broadcast hash map)
        "bpe_encode_merges32k" -> { d =>
          val spark = d.sparkSession
          val head = Seq("t" -> "h", "th" -> "e", "i" -> "n",
            "a" -> "n", "an" -> "d", "e" -> "r", "o" -> "n",
            "in" -> "g") ++
            (for { c1 <- "etaoinshrdlucmfwypvbgkjqxz"
                   c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield (c1.toString, c2.toString))
          val filler = (head.size until 32768)
            .map(i => (s"zx$i", s"qy$i"))
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_probe_merges")
            .resolve("merges.txt")
          java.nio.file.Files.write(tmp,
            ("#version: 0.2\n" + (head ++ filler)
              .map { case (a, b) => s"$a $b" }.mkString("\n") + "\n")
              .getBytes("UTF-8"))
          val bc = graft.text.TokenizerFiles
            .mergesBroadcastFromFile(spark, tmp.toString)
          d.select(explode(TextOps.bpeEncodeKernel(col("text"), bc))
              .as("w"))
            .agg(sum(length(col("w")))).head(); 1L },
        // full tokenizer application at production vocab size: encode
        // through the 32k merge table AND map every symbol to its id
        // via the broadcast vocab — the id lookup is O(1) per symbol,
        // so the window must read like the encode alone
        "bpe_token_ids32k" -> { d =>
          val spark = d.sparkSession
          val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n",
            "a" -> "n", "an" -> "d", "e" -> "r", "o" -> "n",
            "in" -> "g") ++
            (for { c1 <- "etaoinshrdlucmfwypvbgkjqxz"
                   c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield (c1.toString, c2.toString)) ++
            (684 until 32768).map(i => (s"zx$i", s"qy$i"))
          val bcM = TextOps.bpeMergesBroadcast(spark, merges)
          val vocab = ((('a' to 'z') ++ ('0' to '9')).map(_.toString) ++
            merges.map { case (a, b) => a + b }).distinct.zipWithIndex
          val bcV = TextOps.bpeVocabBroadcast(spark, vocab)
          d.select(
              TextOps.bpeEncodeIdsKernel(col("text"), bcM, bcV).as("ids"))
            .agg(sum(size(col("ids")))).head(); 1L },
        // BYTE-LEVEL family at the production regime: gpt2 pre-tokens
        // (regex split, case preserved) + bytes_to_unicode map in
        // front of the same 32k-merge kernel and id lookup — the added
        // per-char map is O(bytes), so the window must read like
        // bpe_token_ids32k plus a constant regex factor, FLAT at 10x
        "bpe_byte_ids32k" -> { d =>
          val spark = d.sparkSession
          val head = Seq("Ġ" -> "t", "Ġ" -> "a", "h" -> "e",
            "i" -> "n", "r" -> "e", "o" -> "n", "Ġt" -> "he",
            "e" -> "r") ++
            (for { c1 <- "etaoinshrdlucmfwypvbgkjqxz"
                   c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield (c1.toString, c2.toString)) ++
            (for { c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield ("Ġ", c2.toString))
          val merges = head ++
            (head.size until 32768).map(i => (s"zx$i", s"qy$i"))
          val bcM = TextOps.bpeMergesBroadcast(spark, merges)
          val vocab = ((('a' to 'z').map(_.toString) :+ "Ġ") ++
            merges.map { case (a, b) => a + b }).distinct.zipWithIndex
          val bcV = TextOps.bpeVocabBroadcast(spark, vocab)
          d.select(TextOps.bpeEncodeIdsByteLevel(col("text"), bcM, bcV)
              .as("ids"))
            .agg(sum(size(col("ids")))).head(); 1L },
        // the METASPACE (Llama-family) front of the same 32k kernel:
        // one replace + one split regex per doc instead of the gpt2
        // pattern — the window must read like bpe_byte_ids32k, FLAT
        // at 10x
        "bpe_metaspace_ids32k" -> { d =>
          val spark = d.sparkSession
          val head = Seq("▁" -> "t", "▁" -> "a", "h" -> "e",
            "i" -> "n", "r" -> "e", "o" -> "n", "▁t" -> "he",
            "e" -> "r") ++
            (for { c1 <- "etaoinshrdlucmfwypvbgkjqxz"
                   c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield (c1.toString, c2.toString)) ++
            (for { c2 <- "etaoinshrdlucmfwypvbgkjqxz" }
              yield ("▁", c2.toString))
          val merges = head ++
            (head.size until 32768).map(i => (s"zx$i", s"qy$i"))
          val bcM = TextOps.bpeMergesBroadcast(spark, merges)
          val vocab = ((('a' to 'z').map(_.toString) :+ "▁") ++
            merges.map { case (a, b) => a + b }).distinct.zipWithIndex
          val bcV = TextOps.bpeVocabBroadcast(spark, vocab)
          d.select(TextOps.bpeEncodeIdsMetaspace(col("text"), bcM, bcV)
              .as("ids"))
            .agg(sum(size(col("ids")))).head(); 1L },
        // WordPiece at BERT vocab scale (~30k entries): greedy
        // longest-match through ONE broadcast — the window must scale
        // with corpus bytes, not vocab size (per-word cost is bounded
        // by the longest piece, not the entry count)
        "wordpiece_ids30k" -> { d =>
          val spark = d.sparkSession
          val ls = 'a' to 'z'
          val vocab = (Seq("[UNK]") ++
            ls.map(_.toString) ++ ls.map(c => s"##$c") ++
            (for { a <- ls; b <- ls } yield s"$a$b") ++
            (for { a <- ls; b <- ls } yield s"##$a$b") ++
            (for { a <- "etaoinshrdlucmfw"; b <- ls; c <- ls }
              yield s"$a$b$c") ++
            (for { a <- "etaoins"; b <- ls; c <- ls }
              yield s"##$a$b$c")).distinct.zipWithIndex
          val bcV = TextOps.wordpieceVocabBroadcast(spark, vocab)
          d.select(TextOps.wordpieceEncodeIds(col("text"), bcV)
              .as("ids"))
            .agg(sum(size(col("ids")))).head(); 1L },
        // multilingual router: one kernel pass per doc, map-only —
        // the window must scale with corpus bytes alone
        "lang_id_multi" -> { d =>
          d.select(TextOps.langIdMulti(col("text")).as("v"))
            .groupBy(col("v.lang")).count().collect(); 1L },
        // r14 additions: corpus BLEU (one kernel pass + one agg), NFC
        // (map-only with the quick-check fast path — corpus is ASCII,
        // the common case), z-order keys (pure integer math)
        "bleu_corpus" -> { d =>
          val nxt = d.select((col("doc_id") - 1).as("doc_id"),
            col("text").as("ntext"))
          TextOps.corpusBleu(d.join(nxt, Seq("doc_id"))
            .select(col("doc_id").as("pair_id"), col("text").as("ref"),
              col("ntext").as("hyp"))).head(); 1L },
        "nfc_normalize" -> { d =>
          d.select(md5(TextOps.nfcNormalize(col("text"))).as("g"))
            .agg(count(lit(1)), min("g")).head(); 1L },
        "fix_mojibake" -> { d =>
          d.select(md5(TextOps.fixMojibake(
              concat(coalesce(col("text"), lit("")),
                when(col("doc_id") % 7 === 0, lit(" cafÃ©"))
                  .otherwise(lit(""))))).as("g"))
            .agg(count(lit(1)), min("g")).head(); 1L },
        // crawl discovery family: sitemap parse (map-only regex) and
        // the full frontier composition (entries → broadcast-rules
        // robots NLJ → anti-join → per-host window)
        "sitemap_entries" -> { d =>
          val xml = concat(
            lit("<urlset><url><loc>https://d"),
            col("doc_id").cast("string"),
            lit(".example.com/p/1</loc><lastmod>2026-01-02</lastmod>" +
              "</url><url><loc>https://d"),
            col("doc_id").cast("string"),
            lit(".example.com/p/2</loc></url></urlset>"))
          graft.io.Sitemap.sitemapEntries(
              d.select(col("doc_id"), xml.as("xml")), "xml")
            .agg(count(lit(1)), max(length(col("url")))).head(); 1L },
        "frontier_sitemap" -> { d =>
          val spark = d.sparkSession
          import org.apache.spark.sql.expressions.Window
          val xml = concat(
            lit("<urlset><url><loc>https://d"),
            pmod(col("doc_id"), lit(5000)).cast("string"),
            lit(".example.com/p/"),
            pmod(col("doc_id"), lit(7)).cast("string"),
            lit("</loc></url></urlset>"))
          val entries = graft.io.Sitemap.sitemapEntries(
              d.select(col("doc_id"), xml.as("xml")), "xml")
            .select(col("url")).distinct()
          val robots = d.select(
            concat(lit("d"), pmod(col("doc_id"), lit(5000))
              .cast("string"), lit(".example.com")).as("host"),
            lit("User-agent: *\nDisallow: /p/2\n").as("body")).distinct()
          val rules = graft.text.UrlOps.robotsAgentRules(robots)
          val dec = graft.text.UrlOps.robotsDecisions(entries, rules,
            urlCol = "url", idCol = "url")
          dec.filter(col("allowed") === 1)
            .withColumn("host",
              regexp_extract(col("url"), "://([^/]+)", 1))
            .withColumn("seq", row_number().over(
              Window.partitionBy("host").orderBy("url")))
            .agg(count(lit(1)), max("seq")).head(); 1L },
        // keyword blocklists at real list size (K=512): ONE automaton
        // pass vs K chained contains — the naive plan is K nodes and
        // K scans per row, the kernel is one walk regardless of K
        "ac_keywords512" -> { d =>
          val spark = d.sparkSession
          val kws = (0 until 508).map(i => s"zqx${i}y") ++
            Seq("spark", "window", "batch", "customer")
          val bc = graft.text.UrlOps.keywordAutomatonBroadcast(spark,
            kws)
          d.select(size(graft.text.UrlOps.urlKeywordMatches(
              col("text"), bc)).as("n"))
            .agg(sum("n")).head(); 1L },
        "contains_keywords512" -> { d =>
          val kws = (0 until 508).map(i => s"zqx${i}y") ++
            Seq("spark", "window", "batch", "customer")
          val flags = kws.map(k =>
            when(col("text").contains(k), 1L).otherwise(0L))
          // balanced tree — a left fold of 512 Adds overflows the
          // analyzer stack; this is also the naive form's best shot
          def bal(cs: Seq[org.apache.spark.sql.Column])
              : org.apache.spark.sql.Column =
            if (cs.size == 1) cs.head
            else { val (a, b) = cs.splitAt(cs.size / 2); bal(a) + bal(b) }
          d.select(bal(flags).as("n"))
            .agg(sum("n")).head(); 1L },
        "zorder_key" -> { d =>
          d.select(graft.ops.Layout.mortonKey(Seq(
              pmod(pmod(col("doc_id"), lit(65536L)) * lit(40503L),
                lit(65536L)),
              pmod(col("doc_id"), lit(65536L))), 16).as("z"))
            .agg(min("z"), max("z")).head(); 1L },
        "contamination_report" -> { d =>
          val split = d.withColumn("s", TextOps.hashSplit(col("doc_id")))
          TextOps.contaminationReport(split.filter(col("s") === "train"),
            split.filter(col("s") === "test"), n = 8)
            .agg(sum("n_hit")).head(); 1L },
        "keep_latest" -> { d =>
          Dedup.exactKeepLatest(
            d.withColumn("crawl", col("doc_id") % 5), "crawl")
            .agg(sum("n_copies")).head(); 1L },
        "mojibake" -> { d =>
          TextOps.mojibakeStats(d)
            .agg(sum("n_non_ascii"), sum("damaged")).head(); 1L },
        // round-9d/9e additions
        "c4_rules" -> { d =>
          // synthesize the multi-line shape the operator exists for
          val lined = concat(col("text"),
            lit("\nshort line"),
            lit("\nThis synthesized line is long enough to keep."))
          TextOps.c4LineFilter(d.select(col("doc_id"), lined.as("text")))
            .agg(sum("kept_lines")).head(); 1L },
        "paragraph_dedup" -> { d =>
          // two paragraphs per doc; footers shared by doc_id%5 class ACROSS
          // replicas — the ownership reduction has real cross-doc work
          val two = d.select(col("doc_id"),
            concat(col("text"), lit("\n\nShared footer number "),
              (col("doc_id") % 5).cast("string")).as("text"))
          Dedup.paragraphDedup(two).agg(sum("kept_paras")).head(); 1L },
        "ppl_buckets" -> { d =>
          TextOps.pplBuckets(d)
            .agg(count_distinct(col("bucket")), sum("nll")).head(); 1L },
        // round-11 additions
        "kn_nll" -> { d =>
          TextOps.kneserNeyNll(d).agg(sum("nll")).head(); 1L },
        "kn_ppl_buckets" -> { d =>
          TextOps.pplBuckets(d, scorer = TextOps.kneserNeyNll(_, _, _))
            .agg(count_distinct(col("bucket")), sum("nll")).head(); 1L },
        "temperature_rates" -> { d =>
          TextOps.temperatureRates(d, targetTotal = 300, tau = 0.5)
            .agg(sum("rate_ppm")).head(); 1L },
        "robots_gate" -> { d =>
          // host cardinality scales with the corpus (id-derived hosts,
          // the fetch_makespan shape); bodies alternate the q222 groups
          val robots = d.select(col("source"),
              (col("doc_id") % 500).cast("string").as("hn")).distinct()
            .select(concat(lit("www."), col("source"), lit("-"),
                col("hn"), lit(".example.com")).as("host"),
              when(col("hn").cast("int") % 2 === 0,
                "User-agent: graftbot\nDisallow: /private/\n" +
                  "Allow: /private/ok*\nDisallow: /cal*$\n\n" +
                  "User-agent: *\nDisallow: /")
                .otherwise("User-agent: *\nDisallow: /p*").as("body"))
          val urls = d.select(col("doc_id"),
            concat(lit("https://www."), col("source"), lit("-"),
              (col("doc_id") % 500).cast("string"), lit(".example.com"),
              when(col("doc_id") % 2 === 0,
                concat(lit("/private/p"), col("doc_id")))
                .otherwise(concat(lit("/public/p"), col("doc_id"))))
              .as("url"))
          val rules = graft.text.UrlOps.robotsAgentRules(robots, "graftbot")
          graft.text.UrlOps.robotsDecisions(urls, rules)
            .agg(sum("allowed")).head(); 1L },
        "domain_reweight" -> { d =>
          TextOps.domainReweight(d).agg(sum("weight_ppm")).head(); 1L },
        "block_segments" -> { d =>
          TextOps.blockSegments(d, blockTokens = 512, nShards = 8)
            .agg(sum("seg_tokens"), count(lit(1))).head(); 1L },
        "fim_transform" -> { d =>
          TextOps.fimTransform(d)
            .agg(sum(length(col("text_fim"))), sum("fim")).head(); 1L },
        "preference_audit" -> { d =>
          // the q228 synthesis shape: %15 degenerates, %10 flipped
          // neighbors — contradiction pairs scale WITH the corpus
          val nxt = d.select((col("doc_id") + 1).as("doc_id"),
            col("text").as("ntext"))
          val degen = col("doc_id") % 15 === 0
          val flip = !degen && col("doc_id") % 10 === 1 &&
            col("ntext").isNotNull
          val pairs = d.filter(col("text").isNotNull)
            .join(nxt, Seq("doc_id"), "left")
            .select(col("doc_id").as("pair_id"),
              concat(lit("p"), (col("doc_id") % 50).cast("string"))
                .as("prompt"),
              when(flip, concat(lit("b: "), col("ntext")))
                .otherwise(concat(lit("a: "), col("text"))).as("chosen"),
              when(degen, concat(lit("a: "), col("text")))
                .when(flip, concat(lit("a: "), col("ntext")))
                .otherwise(concat(lit("b: "), col("text")))
                .as("rejected"))
          graft.ops.Chat.preferenceAudit(pairs)
            .agg(sum("keep"), sum("contradicted")).head(); 1L },
        "ngram_diversity" -> { d =>
          TextOps.ngramDiversity(d, n = 2)
            .agg(sum("n_distinct"), sum("n_ngrams")).head(); 1L },
        "epoch_allocation" -> { d =>
          val srcs = d.filter(col("text").isNotNull).groupBy("source")
            .agg(count(lit(1)).as("n_tokens"))
            .withColumn("epoch_cap",
              (lit(1) + TextOps.hashBucket(col("source"), 4))
                .cast("double"))
          TextOps.epochAllocation(srcs, 100000L)
            .agg(sum("alloc_tokens")).head(); 1L },
        "unigram_segment" -> { d =>
          val words = d.filter(col("text").isNotNull)
            .select(explode(TextOps.wsTokens(lower(col("text"))))
              .as("word"))
            .filter(length(col("word")) > 0)
          TextOps.unigramSegment(words, TextOps.substringVocab(words),
              maxLen = 12)
            .agg(sum("n_pieces"), sum("score")).head(); 1L },
        "unigram_em" -> { d =>
          val words = d.filter(col("text").isNotNull)
            .select(explode(TextOps.wsTokens(lower(col("text"))))
              .as("word"))
            .filter(length(col("word")) > 0)
          TextOps.unigramEmRound(d, TextOps.substringVocab(words))
            .agg(sum("n"), sum("lnp")).head(); 1L },
        "seqlen_sweep" -> { d =>
          TextOps.seqLenSweep(d)
            .agg(sum("kept_tokens"), sum("padding_tokens")).head(); 1L },
        "length_bias" -> { d =>
          val samples = d.filter(col("text").isNotNull)
            .select(expr("doc_id div 5").as("prompt_id"),
              col("doc_id").as("sample_id"), col("text").as("sample"),
              ((col("doc_id") * 31) % 101).cast("double").as("score"))
          graft.ops.Chat.lengthBiasAudit(graft.ops.Chat.bestOfN(samples))
            .head(); 1L },
        "dedup_cascade" -> { d =>
          Dedup.dedupCascade(d)
            .groupBy("stage").count().collect(); 1L },
        "nll_spans" -> { d =>
          TextOps.nllSpans(d, window = 8)
            .agg(sum("span_nll"), count(lit(1))).head(); 1L },
        "hits" -> { d =>
          val k = col("doc_id") % 10
          val e1 = d.select(concat(lit("d"), k).as("src"),
            concat(lit("d"), (k + 1) % 10).as("dst"))
          val e2 = d.filter(k.isin(0, 2, 4))
            .select(concat(lit("d"), k).as("src"),
              concat(lit("d"), (k + 3) % 10).as("dst"))
          Graph.hitsScores(e1.unionAll(e2), iterations = 2)
            .agg(sum("auth"), sum("hub")).head(); 1L },
        "heaps_fit" -> { d =>
          TextOps.heapsLawFit(d)
            .agg(sum("n_points"), sum("beta")).head(); 1L },
        "bradley_terry" -> { d =>
          val b = concat(lit("src"),
            ((col("doc_id") * 7 + 3) % 20).cast("string"))
          graft.ops.Chat.bradleyTerry(d.select(
              col("source").as("model_a"), b.as("model_b"),
              when(((col("doc_id") * 31) % 101) % 2 === 0, col("source"))
                .otherwise(b).as("winner")))
            .agg(sum("rating"), sum("n_matches")).head(); 1L },
        "cohen_kappa" -> { d =>
          graft.ops.Quality.cohenKappa(
            d.withColumn("ann_a", expr("least(n_chars div 40, 2L)"))
              .withColumn("ann_b", expr(
                "least((n_chars + CASE WHEN doc_id % 7 = 0 THEN 15 " +
                  "ELSE 0 END) div 40, 2L)")),
            "ann_a", "ann_b", Seq("source"))
            .agg(sum("kappa")).head(); 1L },
        "mbr_select" -> { d =>
          graft.ops.Chat.mbrSelect(d.filter(col("text").isNotNull)
              .select(expr("doc_id div 5").as("prompt_id"),
                col("doc_id").as("sample_id"), col("text").as("sample")))
            .agg(sum("mbr_utility"), sum("selected")).head(); 1L },
        "isotonic_fit" -> { d =>
          val raw = (col("doc_id") * 37) % 100
          TextOps.isotonicCalibration(d.select(
              (raw.cast("double") / lit(100.0)).as("prob"),
              when((col("doc_id") * 53) % 100 < raw, 1L).otherwise(0L)
                .as("label")))
            .agg(sum("calibrated"), count(lit(1))).head(); 1L },
        "loo_attribution" -> { d =>
          TextOps.looAttribution(d.filter(col("doc_id") % 11 =!= 0),
              d.filter(col("doc_id") % 11 === 0))
            .agg(sum("delta"), count(lit(1))).head(); 1L },
        "retrieval_eval" -> { d =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("query_id")
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          val run = d.select((col("doc_id") % 23).as("query_id"),
              col("doc_id"))
            .withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 10)
          val qrels = d.select((col("doc_id") % 23).as("query_id"),
            col("doc_id"),
            when((col("doc_id") * 31) % 101 < 10, 2)
              .when((col("doc_id") * 31) % 101 < 30, 1).otherwise(0)
              .as("rel"))
          TextOps.retrievalEval(run, qrels, k = 10)
            .agg(sum("ndcg"), sum("mrr")).head(); 1L },
        "confident_learning" -> { d =>
          val raw = (col("doc_id") * 37) % 100
          val clean = when((col("doc_id") * 53) % 100 < raw, 1).otherwise(0)
          TextOps.confidentLearning(d.select(
              (raw.cast("double") / lit(100.0)).as("prob"),
              when(col("doc_id") % 17 === 0, lit(1) - clean)
                .otherwise(clean).as("label")))
            .agg(sum("n")).head(); 1L },
        "fleiss_kappa" -> { d =>
          val rated = d.filter(col("n_chars").isNotNull)
            .select(col("doc_id"), col("n_chars"),
              explode(sequence(lit(0), lit(2))).as("rater"))
            .filter(!(col("doc_id") % 31 === 0 && col("rater") === 2))
            .withColumn("lab", expr(
              "least((n_chars + CASE WHEN (doc_id + rater) % 5 = 0 " +
                "THEN 25 ELSE 0 END) div 40, 2L)"))
          graft.ops.Quality.fleissKappa(rated, "doc_id", "rater", "lab",
            m = 3).head(); 1L },
        "deleted_interp" -> { d =>
          TextOps.deletedInterpolationRound(
            d.filter(col("doc_id") % 11 =!= 0),
            d.filter(col("doc_id") % 11 === 0)).head(); 1L },
        "wilson_winrate" -> { d =>
          val b = concat(lit("src"),
            ((col("doc_id") * 7 + 3) % 20).cast("string"))
          graft.ops.Chat.winRateWilson(d.select(
              col("source").as("model_a"), b.as("model_b"),
              when(((col("doc_id") * 31) % 101) % 2 === 0, col("source"))
                .otherwise(b).as("winner")))
            .agg(sum("wilson_lo")).head(); 1L },
        "pass_at_k" -> { d =>
          graft.ops.Chat.passAtK(d.select(
              expr("doc_id div 10").as("prompt_id"),
              when((col("doc_id") * 31) % 101 < 25, 1).otherwise(0)
                .as("passed")), ks = Seq(1, 5))
            .agg(sum("pass_at_1"), sum("pass_at_5")).head(); 1L },
        "structured_output" -> { d =>
          val resp = when(col("doc_id") % 4 === 0,
              concat(lit("{\"answer\": \"a"),
                (col("doc_id") % 7).cast("string"), lit("\"}")))
            .when(col("doc_id") % 4 === 1, lit("{\"answer\": \"a\""))
            .when(col("doc_id") % 4 === 2, col("text"))
            .otherwise(lit("{\"answer\": 42}"))
          TextOps.structuredOutputRate(
              d.select(col("source"), resp.as("text")))
            .agg(sum("n_valid")).head(); 1L },
        "arena_leaderboard" -> { d =>
          val b = concat(lit("src"),
            ((col("doc_id") * 7 + 3) % 20).cast("string"))
          graft.ops.Chat.arenaLeaderboard(d.select(
              col("source").as("model_a"), b.as("model_b"),
              when(((col("doc_id") * 31) % 101) % 2 === 0, col("source"))
                .otherwise(b).as("winner")))
            .agg(sum("rating"), sum("arena_rank")).head(); 1L },
        "self_consistency" -> { d =>
          graft.ops.Chat.selfConsistency(d.select(
              expr("doc_id div 5").as("prompt_id"),
              when(col("doc_id") % 13 === 0, lit(null).cast("string"))
                .otherwise(concat(lit("Answer "),
                  (((col("doc_id") * 31) % 101) % 3).cast("string")))
                .as("answer")))
            .agg(sum("votes"), sum("n_samples")).head(); 1L },
        "extractive_fragments" -> { d =>
          val toks = filter(TextOps.wsTokens(lower(col("text"))),
            w => length(w) > 0)
          val summary = when(col("doc_id") % 3 === 0,
              concat_ws(" ", slice(toks, 3, 10)))
            .when(col("doc_id") % 3 === 1,
              concat_ws(" ", lit("summary"), lit("of"), col("source")))
            .otherwise(concat(concat_ws(" ", slice(toks, 1, 4)),
              lit(" entirely novel trailing commentary")))
          TextOps.extractiveFragments(d.filter(col("text").isNotNull)
              .select(col("doc_id").as("pair_id"),
                col("text").as("article"), summary.as("summary")))
            .agg(sum("density"), sum("matched_tokens")).head(); 1L },
        "instruction_checks" -> { d =>
          graft.ops.Chat.instructionChecks(d.select(
              col("doc_id").as("pair_id"), col("text").as("response"),
              (lit(5) + col("doc_id") % 20).cast("long").as("min_words"),
              when(length(col("text")) >= 6,
                substring(lower(col("text")), 3, 4)).as("keyword"),
              lit("zzqq").as("forbidden"),
              when(col("doc_id") % 3 === 0, lit(".")).as("must_end_with")))
            .agg(sum("all_pass"), sum("n_words")).head(); 1L },
        "chrf" -> { d =>
          val nxt = d.select((col("doc_id") - 1).as("doc_id"),
            col("text").as("ntext"))
          TextOps.chrF(d.filter(col("text").isNotNull)
              .join(nxt, Seq("doc_id"))
              .select(col("doc_id").as("pair_id"), col("text").as("ref"),
                when(col("doc_id") % 7 === 0, col("text"))
                  .otherwise(col("ntext")).as("hyp")))
            .agg(sum("chrf"), count(lit(1))).head(); 1L },
        "prefix_cache" -> { d =>
          val prompt = when(col("doc_id") % 3 === 0, col("text"))
            .otherwise(concat(
              lit("you are a helpful assistant for "), col("source"),
              lit(" answer briefly and cite sources then "), col("text")))
          TextOps.prefixCacheStats(d.filter(col("text").isNotNull)
              .select(col("doc_id"), prompt.as("text")))
            .agg(sum("saved_tokens"), count(lit(1))).head(); 1L },
        "t_closeness" -> { d =>
          graft.ops.Quality.tCloseness(
            d.withColumn("bin", expr("CAST(n_chars div 10 AS BIGINT)"))
              .withColumn("sens", col("doc_id") % 7),
            Seq("source", "bin"), "sens")
            .agg(sum("emd_num")).head(); 1L },
        // deployed shape: FIXED candidate batch (replica-0 ids only)
        // against the growing pool — the Self-Instruct round
        "rouge_gate" -> { d =>
          val pool = d.filter(col("doc_id") % 5 === 0)
          val cand = d.filter(col("doc_id") % 101 === 7 &&
            col("doc_id") % 5 =!= 0 && col("doc_id") < lit(maxId))
          Dedup.rougeOneGate(pool, cand)
            .agg(sum("keep"), sum("n_tokens")).head(); 1L },
        "bloom_gate" -> { d =>
          def urls(x: DataFrame) = x.select(concat(lit("https://www."),
            col("source"), lit(".example.com/p"),
            (col("doc_id") % 997).cast("string")).as("url"))
          Dedup.bloomGate(urls(d), urls(d.filter(col("doc_id") % 3 === 0)),
            "url", mBits = 65536, kHashes = 3, packed = true)
            .agg(sum("bloom_hit")).head(); 1L },
        "best_of_n" -> { d =>
          val samples = d.filter(col("text").isNotNull)
            .select(expr("doc_id div 5").as("prompt_id"),
              col("doc_id").as("sample_id"), col("text").as("sample"),
              ((col("doc_id") * 31) % 101).cast("double").as("score"))
          graft.ops.Chat.bestOfN(samples)
            .agg(sum("margin"), count(lit(1))).head(); 1L },
        "curate_chat_e8" -> { d =>
          // E8 end-to-end at corpus scale: turns from the q204 synthesis
          // (dup pressure via doc_id%6 neighbor clones), scored samples
          // from the q230 synthesis — one composition window like
          // curate_full
          val nxt = d.select((col("doc_id") - 1).as("doc_id"),
            col("text").as("ntext"))
          val cloned = d.join(nxt, Seq("doc_id"), "left")
            .select(col("doc_id"),
              when(col("doc_id") % 6 === 0 && col("ntext").isNotNull,
                col("ntext")).otherwise(col("text")).as("text"))
            .filter(col("text").isNotNull)
          val turnsE = expr("filter(transform(sequence(0, 3), k -> " +
            "struct(CASE WHEN k % 2 = 0 THEN 'user' ELSE 'assistant' " +
            "END AS role, array_join(slice(split(text, ' '), " +
            "k * 5 + 1, 5), ' ') AS content)), " +
            "x -> length(x.content) > 0)")
          val convs = cloned.select(col("doc_id"), turnsE.as("turns"))
          val samples = d.filter(col("text").isNotNull)
            .select(expr("doc_id div 5").as("prompt_id"),
              col("doc_id").as("sample_id"), col("text").as("sample"),
              ((col("doc_id") * 31) % 101).cast("double").as("score"))
          val r = graft.pipeline.Pipelines.curateChat(convs,
            samples = Some(samples))
          r.sft.agg(count(lit(1))).head()
          r.masks.agg(sum("train")).head()
          r.pairs.get.agg(count(lit(1))).head(); 1L },
        "loss_mask_spans" -> { d =>
          val turns = expr("filter(transform(sequence(0, 3), k -> " +
            "struct(CASE WHEN k % 2 = 0 THEN 'user' ELSE 'assistant' " +
            "END AS role, array_join(slice(split(text, ' '), " +
            "k * 5 + 1, 5), ' ') AS content)), " +
            "x -> length(x.content) > 0)")
          graft.ops.Chat.lossMaskSpans(
            d.filter(col("text").isNotNull)
              .select(col("doc_id"), turns.as("turns")))
            .agg(sum("end_char"), sum("train")).head(); 1L },
        "kmv_distinct16" -> { d =>
          TextOps.kmvDistinct(d, k = 16)
            .agg(sum("estimate")).head(); 1L },
        "stratified_split" -> { d =>
          TextOps.stratifiedSplit(d)
            .groupBy("split").count().agg(sum("count")).head(); 1L },
        "token_fertility" -> { d =>
          TextOps.tokenFertility(d).agg(sum("fertility")).head(); 1L },
        "interpolated_nll" -> { d =>
          TextOps.interpolatedNll(d).agg(sum("nll")).head(); 1L },
        "threshold_sweep" -> { d =>
          val weights = d.sparkSession.range(64)
            .select(col("id").cast("int").as("bucket"),
              (col("id") * 7 % 13 - 6).cast("double").as("weight"))
          val scored = TextOps.scoreLinearModel(d, weights,
            numBuckets = 64, bias = -3.0)
            .withColumn("ref",
              (col("logit") > -3.0).cast("long")) // any reference label
          TextOps.thresholdSweep(scored,
            Seq(-5.0, -3.0, -1.0, 0.0, 1.0, 3.0, 5.0), labelCol = "ref")
            .agg(sum("tp"), sum("fp")).head(); 1L },
        "host_shard_plan" -> { d =>
          val urls = d.select(concat(lit("https://www."), col("source"),
            lit("-"), (col("doc_id") % 1000).cast("string"),
            lit(".example.com/p"), col("doc_id").cast("string")).as("url"))
          graft.text.UrlOps.hostShardPlan(urls, nShards = 64)
            .agg(sum("n_urls"), max("max_host_urls")).head(); 1L },
        "code_signals" -> { d =>
          TextOps.codeSignals(d)
            .agg(sum("is_code"), sum("kw_hits")).head(); 1L },
        "table_extract" -> { d =>
          val html = concat(lit("<table><tr><th>a</th></tr><tr><td>"),
            col("doc_id").cast("string"), lit("</td><td>"), col("text"),
            lit("</td></tr></table>"))
          d.select(posexplode(TextOps.extractTables(html))
              .as(Seq("r", "cells")))
            .agg(sum(size(col("cells")))).head(); 1L },
        "span_corruption" -> { d =>
          TextOps.spanCorruption(d)
            .agg(sum("n_masked"), sum(length(col("input_text"))))
            .head(); 1L },
        "pii_report" -> { d =>
          TextOps.piiReport(d).agg(sum("n_email"), sum("n_docs"))
            .head(); 1L },
        "dedup_audit" -> { d =>
          Dedup.dedupAudit(d).agg(sum("n_exact"), sum("n_docs"))
            .head(); 1L },
        "url_depth" -> { d =>
          val urls = d.select(concat(lit("https://www."), col("source"),
            lit(".example.com/a/b/p"), (col("doc_id") % 9).cast("string"))
            .as("url"))
          graft.text.UrlOps.urlDepthStats(urls)
            .agg(sum("n_urls"), max("max_depth")).head(); 1L },
        "crawl_frontier" -> { d =>
          // candidate domain grows with the corpus (doc_id-derived
          // paths); crawled = the %7 path family
          def u(p: org.apache.spark.sql.Column) =
            concat(lit("https://www."), col("source"),
              lit(".example.com/p"), p.cast("string"))
          val crawled = d.select(u(col("doc_id") % 7).as("url"))
          val cand = d.select(u((col("doc_id") + 1) % 9).as("url"))
            .unionAll(d.select(u(col("doc_id") % 11).as("url")))
          graft.text.UrlOps.crawlFrontier(cand, crawled, k = 100)
            .agg(sum("n_refs")).head(); 1L },
        "epoch_shuffle" -> { d =>
          TextOps.epochShuffleOrder(d, epochs = 3, topK = 10)
            .agg(sum("doc_id")).head(); 1L },
        "l_diversity" -> { d =>
          graft.ops.Quality.lDiversity(
            d.withColumn("bin", expr("n_chars div 10"))
              .withColumn("sens", col("doc_id") % 7),
            Seq("source", "bin"), "sens", l = 3).head(); 1L },
        "shard_balance" -> { d =>
          TextOps.shardBalance(d, nShards = 64)
            .agg(sum("n_tokens"), max("balance")).head(); 1L },
        "fetch_makespan" -> { d =>
          // host cardinality scales with the corpus (id-derived hosts)
          val urls = d.select(concat(lit("https://www."), col("source"),
            lit("-"), (col("doc_id") % 500).cast("string"),
            lit(".example.com/p"), col("doc_id").cast("string"))
            .as("url"))
          val robots = d.select(concat(lit("www."), col("source"),
              lit("-"), (col("doc_id") % 500).cast("string"),
              lit(".example.com")).as("host"),
              lit("Crawl-delay: 2").as("robots_txt")).distinct()
          graft.text.UrlOps.fetchMakespan(urls, robots, nShards = 16)
            .agg(sum("n_urls"), max("makespan_seconds")).head(); 1L }))

    // embedding-family probe: replicate embeddings with coordinate jitter
    // derived from the replica index (deterministic, no RNG)
    val ebase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val eMax = ebase.agg(max("vec_id")).head().getLong(0) + 1
    def replicateEmb(times: Int): DataFrame =
      (0 until times).map { r =>
        ebase.select((col("vec_id") + lit(r * eMax)).as("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => x + lit(r * 0.001)).as("embedding"), col("label"))
      }.reduce(_ unionAll _)

    def embSuite(embs: DataFrame): Map[String, Double] = {
      import graft.ml.Similarity
      timedSuite(embs)(Seq(
        "kmeans_3x8" -> { d => Similarity.kmeans(d, k = 8, iters = 3).count() },
        "batch_topk_q16" -> { d =>
          val q = d.filter(col("vec_id") < 16)
            .select(col("vec_id").as("q_id"),
              col("embedding").as("q_vec"))
          Similarity.batchTopK(d, q, k = 10).count() },
        "semdedup_label" -> { d =>
          Dedup.semDeDup(d, blockCol = "label", minCosine = 0.99).count() },
        // semantic decontamination: eval side fixed at 64 vectors (the
        // benchmark-sized side), train side scales — the window must
        // track the train-side bucket join, near-flat at 10x
        "sem_decon" -> { d =>
          Dedup.semanticDecontaminate(d,
            d.filter(col("vec_id") % 311 === 0).select(col("embedding")),
            planes = 8, minCosine = 0.95).count() },
        "quantize_int8" -> { d => Similarity.quantizeInt8(d).count() },
        "hamming_topk_q16" -> { d =>
          val bin = Similarity.quantizeBinary(d)
          val q = bin.filter(col("vec_id") < 16)
            .select(col("vec_id").as("q_id"), col("bvec").as("q_bvec"))
          Similarity.hammingTopK(bin, q, k = 10).count() },
        "hard_negatives" -> { d =>
          Similarity.hardNegatives(d, k = 3, planes = 6)
            .agg(sum("cosine"), count(lit(1))).head(); 1L },
        "pool_divergence" -> { d =>
          val cents = d.filter(col("vec_id") < 3)
            .select(col("vec_id"), col("embedding").cast("array<double>"))
            .collect().toSeq
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          Similarity.poolDivergence(d.filter(col("label") % 2 === 0),
              d.filter(col("label") % 2 === 1), cents)
            .agg(sum("jeffreys")).head(); 1L },
        "bitext_margin" -> { d =>
          Similarity.bitextMine(d.filter(col("label") % 2 === 0),
              d.filter(col("label") % 2 === 1), k = 4, planes = 4)
            .agg(sum("margin"), sum("mutual")).head(); 1L },
        "cluster_quota" -> { d =>
          val cents = d.filter(col("vec_id") < 8)
            .select(col("vec_id"), col("embedding").cast("array<double>"))
            .collect().toSeq
            .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          Similarity.clusterQuotaSelect(d, cents, quota = 50,
              score = TextOps.hashBucket(col("vec_id"), 1000))
            .agg(sum("score"), count(lit(1))).head(); 1L },
        "matryoshka_topk" -> { d =>
          val q = d.filter(col("vec_id") === 0)
            .select(col("embedding").cast("array<double>"))
            .head().getSeq[Double](0).toArray
          Similarity.matryoshkaTopK(d, typedlit(q), k = 10,
            shortlist = 50, prefixDim = 16)
            .agg(sum("cosine")).head(); 1L },
        "pq_encode" -> { d =>
          // aggregate the codes so the kernel can't be pruned
          Similarity.pqEncode(d, m = 8, k = 16)
            .select(explode(col("codes")).as("c"))
            .agg(sum("c")).head(); 1L },
        "random_project" -> { d =>
          Similarity.randomProject(d, outDim = 16)
            .select(explode(col("proj")).as("p"))
            .agg(sum("p")).head(); 1L },
        "silhouette" -> { d =>
          Similarity.silhouette(d).agg(sum("s")).head(); 1L },
        // round-9e: ADC serving — the timed work is encode + LUT reads +
        // one bounded take over the whole (replicated) corpus
        "pq_adc_topk" -> { d =>
          val q = d.filter(col("vec_id") === 0)
            .select(col("embedding").cast("array<double>"))
            .head().getSeq[Double](0).toArray
          Similarity.pqAdcTopK(d, q, topK = 10).count() },
        "embedding_audit" -> { d =>
          Similarity.embeddingAudit(d)
            .agg(sum("max_norm"), sum("n_vectors")).head(); 1L },
        "ivf_pq_topk" -> { d =>
          val q = d.filter(col("vec_id") === 0)
            .select(col("embedding").cast("array<double>"))
            .head().getSeq[Double](0).toArray
          Similarity.ivfPqTopK(d, q, topK = 10, clusterCol = "label",
            nProbe = 3).count() },
        "centroid_drift" -> { d =>
          Similarity.centroidDrift(d.filter(col("vec_id") % 2 === 0),
            d.filter(col("vec_id") % 2 === 1))
            .agg(sum("drift")).head(); 1L }))
    }

    // event-family probe: replicate by user-id offset (funnel/retention
    // cost scales with users × their events; replicas are disjoint users)
    val evbase = graft.io.Readers.table(spark, sfDir, "events")
      .select("user_id", "ts", "event_type", "event_id", "value")
    val uMax = evbase.agg(max("user_id")).head().getLong(0) + 1
    val evMax = evbase.agg(max("event_id")).head().getLong(0) + 1
    def replicateEv(times: Int): DataFrame =
      (0 until times).map { r =>
        evbase.select((col("user_id") + lit(r * uMax)).as("user_id"),
          col("ts"), col("event_type"),
          (col("event_id") + lit(r * evMax)).as("event_id"), col("value"))
      }.reduce(_ unionAll _)

    def evSuite(ev: DataFrame): Map[String, Double] = {
      import graft.ops.Events
      timedSuite(ev)(Seq(
        "skew_report" -> { d =>
          graft.ops.Stats.skewReport(d, "user_id", topK = 5)
            .agg(sum("n"), max("skew_factor")).head(); 1L },
        "funnel3" -> { d =>
          Events.funnel(d, Seq("view", "click", "purchase"),
            maxGapSec = 43200L).count() },
        "retention" -> { d => Events.cohortRetention(d).count() },
        "transitions" -> { d => Events.transitionCounts(d).count() },
        "mad_outliers" -> { d =>
          graft.ops.Stats.madOutliers(d, Seq("event_type"), "value")
            .count() },
        "cusum" -> { d =>
          // aggregate the window output — .count() would prune the
          // prefix-sum Window node and time only the scan
          graft.ops.Stats.cusum(d, Seq("event_type"), "value",
            Seq(col("ts"), col("event_id")), 2000.0)
            .agg(sum("cusum"), sum("drift")).head(); 1L },
        "dq_report" -> { d =>
          graft.ops.Quality.expectationsReport(d,
            Seq("v_not_null" -> col("value").isNotNull,
              "v_range" -> col("value").between(0.0, 1000.0)),
            uniqueCols = Seq("event_id")).count() },
        // round-5 report operators (all emit tiny reports — aggregate the
        // OUTPUT columns so Catalyst can't prune the operator under test)
        "psi" -> { d =>
          val coh = d.withColumn("coh",
            when(TextOps.hashBucket(col("event_id"), 2) === 0, "a")
              .otherwise("b"))
          graft.ops.Stats.psi(coh, "coh", "value", "a", "b",
            binWidth = 50.0).head(); 1L },
        "hourly_corr" -> { d =>
          graft.ops.Events.hourlyTypeCorrelation(d)
            .agg(sum("r"), sum("n")).head(); 1L },
        "session_baskets" -> { d =>
          graft.ops.Events.sessionBaskets(d, gapSeconds = 1800)
            .agg(sum("support")).head(); 1L }))
    }

    // multimodal family: synthesize binary assets from the replicated doc
    // ids (payload content is a pure function of the id, so replicas carry
    // distinct images) and probe the decode-side operators — the timed
    // input INCLUDES the payload column, as a real asset table would
    def assetSuite(docs: DataFrame): Map[String, Double] = {
      import graft.multimodal.Multimodal
      timedSuite(Multimodal.synthesizeAssets(docs))(Seq(
        "mm_features" -> { d =>
          Multimodal.extractFeatures(d).agg(sum("m0")).head(); 1L },
        // mixed PNG/JPEG corpus: same map-only decode class, the lossy
        // codec paying real per-image CPU in-scan
        "jpeg_features" -> { d =>
          Multimodal.extractFeatures(
              Multimodal.synthesizeAssetsMixed(
                d.select(col("asset_id").as("doc_id")))
                .filter(col("modality") === "image"))
            .agg(sum("m0")).head(); 1L },
        "image_dhash" -> { d =>
          Multimodal.imageDhash(d).agg(max("fp")).head(); 1L },
        "image_neardup" -> { d =>
          // pair output is quadratic in perceptual-dup density (the
          // synthetic gradients are all near-dups of each other) — the
          // probe measures the output-bound regime; see image_dedup for
          // the collapse path
          Multimodal.imageNearDup(d, maxHamming = 3).count() },
        "image_dedup" -> { d =>
          Multimodal.imageDupGroups(d).agg(sum("n_images")).head(); 1L },
        "audio_dhash" -> { d =>
          Multimodal.audioDhash(d).agg(max("fp")).head(); 1L }))
    }

    // video family: every synthesized video OPENS WITH THE SAME INTRO
    // frame (the corpus-wide hot key videoNearDupByFrame's maxDf cap
    // exists for), then 3 id-derived frames. The capped path must stay
    // ~linear in videos; the uncapped path pays the quadratic intro
    // fanout — the measured justification for "at 100 TB always keep a
    // cap". Only 1-in-10 docs carries a video so the uncapped quadratic
    // regime stays computable at Kx.
    def videoSuite(docs: DataFrame): Map[String, Double] = {
      import graft.multimodal.Multimodal
      val mkVideo = udf { (id: Long) =>
        val frames = Multimodal.encodePng(424242L, 0) +:
          (1 to 3).map(f => Multimodal.encodePng(id, f))
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        out.write(Array[Byte]('G', 'F', 'V', '1'))
        out.writeInt(frames.length)
        frames.foreach { b => out.writeInt(b.length); out.write(b) }
        bos.toByteArray
      }
      val assets = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("asset_id"),
          lit("video").as("modality"), mkVideo(col("doc_id")).as("payload"))
      timedSuite(assets)(Seq(
        "video_neardup_capped" -> { d =>
          Multimodal.videoNearDupByFrame(d, maxDf = 50).count() },
        "video_neardup_uncapped" -> { d =>
          Multimodal.videoNearDupByFrame(d, maxDf = Int.MaxValue).count() }))
    }

    // WARC-family probe: synthesizes multi-record archives ON DISK (the
    // operator's cost is scan+parse, so the probe must include file IO),
    // plain and gzipped. The file COUNT scales with `times` — the
    // file-level parallelism Common Crawl's ~1 GB segment layout assumes;
    // gzip is non-splittable, so its parallelism IS the file count (one
    // task per archive) — the caveat SURVEY §9 records.
    def warcSuite(times: Int): Map[String, Double] = {
      val labels = Seq("warc_records_plain", "warc_ingest_plain",
        "warc_records_gz")
      if (opFilter.nonEmpty && !labels.exists(opFilter)) return Map.empty
      val dir =
        java.nio.file.Files.createTempDirectory(s"graft_warc_${times}x_")
      val nFiles = 4 * times
      val recsPerFile = 5000
      val filler =
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 10
      (0 until nFiles).foreach { f =>
        def writeTo(os: java.io.OutputStream): Unit = {
          val w = new java.io.BufferedOutputStream(os, 1 << 16)
          (0 until recsPerFile).foreach { r =>
            val id = f.toLong * recsPerFile + r
            val body = s"<html><body>record $id $filler</body></html>"
            val http =
              s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
            val rec = s"WARC/1.0\r\nWARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:uuid:rec-$id>\r\n" +
              s"WARC-Date: 2025-01-01T00:00:00Z\r\n" +
              s"WARC-Target-URI: https://example.com/page/$id\r\n" +
              s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
            w.write(rec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          w.close()
        }
        val plain = dir.resolve(f"part$f%04d.warc").toFile
        val gz = dir.resolve(f"part$f%04d.warc.gz").toFile
        plain.deleteOnExit(); gz.deleteOnExit()
        writeTo(new java.io.FileOutputStream(plain))
        writeTo(new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(gz)))
      }
      dir.toFile.deleteOnExit()
      def timeOp(label: String)(body: => Long): Option[(String, Double)] = {
        if (opFilter.nonEmpty && !opFilter(label)) return None
        def once(): (Double, Long) = {
          val t0 = System.nanoTime(); val n = body
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (a, n) = once(); val (b, _) = once() // min-of-2, as everywhere
        val dt = math.min(a, b)
        println(f"  $label: $dt%.2f s ($n rows)")
        Some(label -> dt)
      }
      (timeOp("warc_records_plain") {
        graft.io.Warc.records(spark, s"$dir/*.warc").count() } ++
        timeOp("warc_ingest_plain") {
          graft.pipeline.Pipelines.ingestWarc(spark, s"$dir/*.warc")
            .count() } ++
        timeOp("warc_records_gz") {
          graft.io.Warc.records(spark, s"$dir/*.warc.gz").count() }).toMap
    }

    // stored-signature incremental near-dup probe (VERDICT r9 item 1):
    // the CORPUS scales with `times`, the BATCH stays fixed at 1x docs —
    // the daily-ingest shape. The index is persisted (bucketed tables)
    // OUTSIDE the timed window, the once-per-corpus cost. The stored
    // batch path should grow only with the digest-table scan (~0.8 kB/doc
    // vs re-shingling the text), while the recompute path re-signs the
    // whole corpus per batch — the comparison the stored index exists for.
    def incrementalSuite(times: Int): Map[String, Double] = {
      val labels = Seq("incr_fuzzy_stored_batch", "incr_fuzzy_recompute")
      if (opFilter.nonEmpty && !labels.exists(opFilter)) return Map.empty
      val corpus = replicate(times).cache()
      corpus.count()
      // fixed batch: 1x ids shifted clear of every replica; half of the
      // docs near-dup a corpus doc (one appended token), half are fresh
      // (reversed text — disjoint shingles)
      val batch = base.select(
        (col("doc_id") + lit((times + 1) * maxId)).as("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(" tail")))
          .otherwise(reverse(col("text"))).as("text"))
        .cache()
      batch.count()
      val tbl = s"sp_sigidx_${times}x"
      Dedup.writeSignatureIndex(Dedup.buildSignatureIndex(corpus), tbl,
        buckets = 32)
      val idx = Dedup.readSignatureIndex(spark, tbl)
      def timeOp(label: String)(body: => Long): Option[(String, Double)] = {
        if (opFilter.nonEmpty && !opFilter(label)) return None
        def once(): (Double, Long) = {
          val t0 = System.nanoTime(); val n = body
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (a, n) = once(); val (b, _) = once() // min-of-2, as everywhere
        val dt = math.min(a, b)
        println(f"  $label: $dt%.2f s ($n rows)")
        Some(label -> dt)
      }
      val out = (timeOp("incr_fuzzy_stored_batch") {
        Dedup.incrementalNewFuzzyIndexed(batch, idx).count() } ++
        timeOp("incr_fuzzy_recompute") {
          Dedup.incrementalNewFuzzy(batch, corpus).count() }).toMap
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_sigs")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_bands")
      corpus.unpersist(false); batch.unpersist(false)
      spark.catalog.clearCache()
      out
    }

    // full-curate probe (VERDICT r9 item 5): the complete E4 composition
    // a user actually runs — c4 line cleanup, quality/damage/blocklist
    // gates, paragraph + exact + near-dup dedup, per-domain cap, fuzzy
    // decontamination, split, and the sharded training-set SINK — as ONE
    // timed window, so stage interactions (cache pressure between dedup
    // passes, shard-write fan-in) are measured, not inferred from the
    // per-operator windows. Text is given the q168 line shape (a short
    // droppable line + a guaranteed keeper) so the c4 stage does real
    // selective work instead of dropping or keeping everything.
    def curateSuite(times: Int): Map[String, Double] = {
      if (opFilter.nonEmpty && !opFilter("curate_full")) return Map.empty
      val docs = replicate(times)
        .select(col("doc_id"),
          concat(col("text"), lit(".\nshort line\n"),
            lit("This synthesized line is long enough to keep."))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .withColumn("url", concat(lit("https://www."), col("source"),
          lit("-"), (col("doc_id") % 200).cast("string"),
          lit(".example.com/p"), col("doc_id").cast("string")))
        .cache()
      docs.count()
      def once(): (Double, Long) = {
        val out = java.nio.file.Files
          .createTempDirectory(s"graft_curate_${times}x_")
        out.toFile.deleteOnExit()
        val t0 = System.nanoTime()
        val curated = graft.pipeline.Pipelines.curate(docs,
          minJaccard = 0.5, fuzzyDecontaminate = true,
          maxPerDomain = Some(100), urlCol = "url",
          blockWords = Some(Seq("damnword")), dropDamaged = true,
          c4Lines = true, dedupParagraphs = true)
        graft.io.Writers.shardedTrainingSetWithManifest(
          curated.filter(col("split") === "train"),
          out.resolve("shards").toString, nShards = 8)
        // shard=*/ glob: the manifest.json beside the tree is not parquet
        val n = spark.read.parquet(
          out.resolve("shards").toString + "/shard=*").count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (a, n) = once(); val (b, _) = once() // min-of-2, as everywhere
      val dt = math.min(a, b)
      println(f"  curate_full: $dt%.2f s ($n rows)")
      docs.unpersist(false)
      spark.catalog.clearCache()
      Map("curate_full" -> dt)
    }

    // recall QUALITY probe (prints a band, not a timing row): the
    // q337/q338 semantic-decontamination blocking recall re-measured
    // at 1x and Kx — recall is DATA-DEPENDENT (plane-bucket collision
    // odds shift with corpus density), so the sf0.1-pinned band must
    // be re-measured at scale, never extrapolated. Construction is
    // q337's: eval = a bounded slice of vectors perturbed +0.04 on
    // the first 8 coords (self-cosine stays >= 0.99, angles move
    // enough to flip some of the 6 planes); brute = the same 0.9
    // threshold with NO bucket restriction; recall = found / brute.
    def recallSuite(times: Int): Unit = {
      if (opFilter.nonEmpty && !opFilter("sem_decon_recall")) return
      import graft.ml.Similarity
      val embs = replicateEmb(times).cache(); embs.count()
      val ev = embs.filter(col("vec_id") % 311 === 3)
        .select(transform(col("embedding").cast("array<double>"),
          (x, i) => x + when(i < 8, lit(0.04)).otherwise(lit(0.0)))
          .as("embedding"))
      val e2 = embs.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Similarity.norm(col("v"), 64))
      val qv = ev.select(col("embedding").as("ee"))
        .withColumn("enrm", Similarity.norm(col("ee"), 64))
      val brute = e2.crossJoin(broadcast(qv))
        .filter(col("nrm") * col("enrm") > 0)
        .filter(Similarity.dot(col("v"), col("ee"), 64) /
          (col("nrm") * col("enrm")) >= 0.9)
        .select("vec_id").distinct().cache()
      val nBrute = brute.count()
      Seq("single" -> false, "multi" -> true).foreach {
        case (label, mp) =>
          val survivors = Dedup.semanticDecontaminate(embs, ev,
            minCosine = 0.9, planes = 6, multiProbe = mp)
          val found = embs.select("vec_id")
            .join(survivors.select("vec_id"), Seq("vec_id"),
              "left_anti")
          val nFound = brute.join(found, Seq("vec_id"), "left_semi")
            .count()
          val recall =
            if (nBrute == 0) 1.0 else nFound.toDouble / nBrute
          println(f"  sem_decon_recall_$label%s(${times}%dx): " +
            f"$nFound%d/$nBrute%d = $recall%.3f")
      }
      brute.unpersist(false)
      embs.unpersist(false)
      spark.catalog.clearCache()
    }

    println(s"== pass 0: warmup (codegen) ==")
    suite(replicate(1)); embSuite(replicateEmb(1)); evSuite(replicateEv(1))
    assetSuite(replicate(1)); videoSuite(replicate(1)); warcSuite(1)
    incrementalSuite(1); curateSuite(1)
    println(s"== pass 1: 1x (${maxId} docs, ${eMax} vecs) ==")
    val t1 = suite(replicate(1)) ++ embSuite(replicateEmb(1)) ++
      evSuite(replicateEv(1)) ++ assetSuite(replicate(1)) ++
      videoSuite(replicate(1)) ++ warcSuite(1) ++ incrementalSuite(1) ++
      curateSuite(1)
    recallSuite(1)
    println(s"== pass 2: ${k}x (${k * maxId} docs, ${k * eMax} vecs) ==")
    val tk = suite(replicate(k)) ++ embSuite(replicateEmb(k)) ++
      evSuite(replicateEv(k)) ++ assetSuite(replicate(k)) ++
      videoSuite(replicate(k)) ++ warcSuite(k) ++ incrementalSuite(k) ++
      curateSuite(k)
    recallSuite(k)
    println(f"%nop             | 1x (s) | ${k}%dx (s) | ratio (linear=$k%d.0)")
    t1.keys.toSeq.sorted.foreach { op =>
      println(f"$op%-22s ${t1(op)}%7.2f ${tk(op)}%9.2f ${tk(op) / t1(op)}%8.1f")
    }
    spark.stop()
  }
}
