package graft

/** Physical-plan assertions: the properties that make the engine viable at
  * 100 TB are plan shapes, not results — filters reaching the parquet
  * scan, dimension broadcasts, partial aggregation, and the absence of
  * accidental cartesian products. Asserted here so a regression in plan
  * quality fails CI even when results stay correct. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.toString

  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // run it: AQE only materializes codegen spans in the
                 // FINAL plan (isFinalPlan=true)
    df.queryExecution.executedPlan.toString
  }

  test("q01 band filter is pushed into the parquet scan") {
    val p = plan("q01_range_filter")
    assert(p.contains("PushedFilters: [IsNotNull(value), " +
      "GreaterThanOrEqual(value,5.0), LessThanOrEqual(value,300.0)]"),
      s"filter not pushed:\n$p")
  }

  test("q139 URL normalization and q141 compression ratio are map-only: " +
    "no join, no aggregation, no hash shuffle") {
    // the trailing orderBy (oracle presentation) may range-shuffle on a
    // multi-file input; the operators themselves must not join,
    // aggregate, or hash-exchange
    Seq("q139_url_normalize", "q141_compression_ratio").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("Aggregate") &&
        !p.contains("hashpartitioning"),
        s"$q should be a pure projection:\n$p")
    }
  }

  test("q144 html extraction and q145 gopher rules are map-only: " +
    "no join, no aggregation, no hash shuffle") {
    Seq("q144_html_extract", "q145_gopher_rules").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("Aggregate") &&
        !p.contains("hashpartitioning"),
        s"$q should be a pure projection:\n$p")
    }
  }

  test("q143 per-domain cap: no join, at most the one window shuffle, " +
    "and the rank limit pushes down as a PARTIAL WindowGroupLimit") {
    val p = plan("q143_domain_cap")
    assert(!p.contains("Join"), s"cap should not join:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length <= 1,
      s"at most one hash exchange (the window):\n$p")
    assert(p.contains("Window"), s"expected the row_number window:\n$p")
    // the scale property: Spark's WindowGroupLimit applies the k-cap
    // per input partition BEFORE any exchange — the two-phase
    // mega-domain mitigation, performed by the engine itself
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"rank-limit pushdown missing:\n$p")
  }

  test("a range filter on an NTZ-shimmed timestamp column still reaches " +
    "the parquet scan's PushedFilters") {
    // Readers.table casts TIMESTAMP_NTZ fields to session-TZ timestamps;
    // under the UTC session Catalyst must unwrap that cast in
    // comparisons, or every date-range scan at 100 TB reads the full
    // table
    val p = graft.io.Readers.table(spark, dir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderdate") >
        "2024-01-15")
      .select("o_orderkey", "o_orderdate")
      .queryExecution.sparkPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThan(o_orderdate,"),
      s"ts filter not pushed through the NTZ shim:\n$p")
  }

  test("q40 star join broadcasts dimensions and prunes the fact scan") {
    val p = plan("q40_star_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
    // column pruning: the lineitem scan must not read unused columns
    assert(!p.contains("l_shipdate"), s"fact scan not pruned:\n$p")
  }

  test("q21 exact dedup aggregates with a map-side partial") {
    val p = plan("q21_dedup_exact")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("q07 point-in-interval is a broadcast nested-loop, not a cartesian") {
    val p = plan("q07_point_in_interval_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q45 plans a left anti join") {
    val p = plan("q45_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("q54 decontamination broadcasts eval shingles and contaminated ids") {
    val p = plan("q54_decontaminate")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // both probe sides broadcast; the train text column never shuffles
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q53 tf-idf keeps partial aggregation and broadcasts the 1-row N") {
    val p = plan("q53_tfidf_topk")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q61 batched ANN broadcasts queries and partial-aggregates top-k") {
    val p = plan("q61_batch_ann")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the bounded TopK UDAF must run map-side before the q_id exchange —
    // that is the property that keeps the shuffle at q·k rows
    assert(p.contains("partial_topk"), s"no partial top-k agg:\n$p")
  }

  test("q62 binned interval join plans an equi semi-join, no nested loop") {
    val p = plan("q62_binned_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"binned path fell back to a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q63 chunking is a pure generator: no join, no aggregation") {
    val p = plan("q63_chunk_tokens")
    assert(p.contains("Generate"), s"no generator (posexplode):\n$p")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"chunking must not aggregate:\n$p")
  }

  test("q64 mixture sampling broadcasts the rates table") {
    val p = plan("q64_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), s"rates join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled for a |strata|-row join:\n$p")
  }

  test("q65 vocabulary partial-aggregates and takes an ordered limit") {
    val p = plan("q65_vocab_topk")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not pushed into a bounded take:\n$p")
  }

  test("q69 fuzzy join aggregates to the distinct domain before joining") {
    val p = plan("q69_fuzzy_pairs")
    // the distinct() must run BEFORE the self-join: the join then sees the
    // value domain, not the row count
    assert(p.contains("HashAggregate"), s"no distinct aggregation:\n$p")
    assert(p.contains("Join"), s"no join:\n$p")
    val firstJoin = p.indexOf("Join")
    val lastAgg = p.lastIndexOf("HashAggregate")
    // plan strings print top-down: an aggregate BELOW the join appears
    // after it textually
    assert(lastAgg > firstJoin,
      s"distinct does not feed the join:\n$p")
  }

  test("q71 cube expands grouping sets with partial aggregation") {
    val p = plan("q71_cube")
    assert(p.contains("Expand"), s"no grouping-set expansion:\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("q74 BM25 filters the explode before any shuffle and broadcasts " +
    "df + stats") {
    val p = plan("q74_bm25_topk")
    // the query-term IN-list must sit under Generate (map-side), so only
    // hit rows reach the (doc, term) aggregation
    assert(p.contains("Generate"), s"no token explode:\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), s"df/stats not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not a bounded take:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-sized shuffle join in BM25:\n$p")
  }

  test("q75 adaptive gate broadcasts the per-group thresholds") {
    val p = plan("q75_adaptive_gate")
    assert(p.contains("BroadcastHashJoin"),
      s"threshold join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled against a |groups|-row table:\n$p")
  }

  test("q77 MAD outliers broadcasts both statistics tables") {
    val p = plan("q77_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), s"stats joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled against |groups|-row stats:\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("q78 transitions partial-aggregate after one user-keyed window") {
    val p = plan("q78_transitions")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
    assert(!p.contains("Join"), s"transition matrix must not join:\n$p")
  }

  test("q81 PMI broadcasts the vocabulary and corpus-size frames") {
    val p = plan("q81_pmi_pairs")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"vocab/N not broadcast:\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not a bounded take:\n$p")
  }

  test("q82 session stats never join — one user-keyed window + agg") {
    val p = plan("q82_session_stats")
    assert(!p.contains("Join"), s"session rollup must not join:\n$p")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("q86 weighted sample is a bounded ordered take, no shuffle join") {
    val p = plan("q86_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"sample not a bounded take:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q87 token entropy is map-only: no join, no aggregation, " +
    "no generator") {
    val p = plan("q87_token_entropy")
    assert(!p.contains("Join"), s"entropy must not join:\n$p")
    assert(!p.contains("HashAggregate"),
      s"entropy must not aggregate — the kernel counts within the row:\n$p")
    assert(!p.contains("Generate"), s"entropy must not explode:\n$p")
  }

  test("q89 expectations evaluate in one aggregation pass — a single " +
    "scan regardless of check count") {
    val p = plan("q89_dq_report")
    // one scan + one (expanded, for the distinct) aggregation tree; more
    // than one FileScan would mean per-check passes
    val scans = "FileScan|BatchScan".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("native kernels stay inside WholeStageCodegen spans") {
    // the custom Expressions generate code via nullSafeCodeGen, so the
    // operator evaluating them must sit inside a codegen span — the
    // `*(n)` prefix in the final AQE plan. A fallback to interpreted
    // eval would print the kernel on an unstarred operator line.
    Seq("q87_token_entropy" -> "tokenentropy",
      "q26_embedding_topk" -> "dotproduct",
      "q24_minhash_lsh" -> "minhashsignature").foreach { case (q, pat) =>
      // judge only the FINAL plan — the "== Initial Plan ==" section AQE
      // appends prints every operator unstarred
      val full = executed(q).toLowerCase
      val p = full.indexOf("== initial plan ==") match {
        case -1 => full
        case i => full.substring(0, i)
      }
      val starred = s"\\*\\(\\d+\\)[^\\n]*$pat".r
      assert(starred.findFirstIn(p).isDefined,
        s"$q: kernel '$pat' not inside a codegen span:\n$p")
      // ...and on NO unstarred operator line: a partial interpreted-eval
      // fallback (kernel in one starred and one unstarred operator) is
      // exactly the regression this test exists to catch
      val offenders = p.linesIterator
        .filter(_.contains(pat))
        .filterNot(l => "\\*\\(\\d+\\)".r.findFirstIn(l).isDefined)
        // scan lines ECHO referenced filters in their DataFilters
        // metadata; evaluation happens in the starred Filter above
        .filterNot(l => l.contains("filescan") || l.contains("batchscan"))
        .toSeq
      assert(offenders.isEmpty,
        s"$q: kernel '$pat' evaluated outside codegen:\n" +
          offenders.mkString("\n"))
    }
  }

  test("no query plans a cartesian product") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("round-5 window ops partition by their key — no unpartitioned " +
    "doc/event windows") {
    // q118/q119 window on (user_id[, event_type]); q122 on lang. The
    // only legitimately unpartitioned windows in these plans run over
    // bin/offset tables, which carry no doc/event payload columns.
    Seq("q118_scd2" -> "user_id", "q119_pit_enrich" -> "user_id",
      "q122_nucleus_vocab" -> "lang").foreach { case (q, key) =>
      val p = plan(q)
      val windows = "Window \\[[^\\]]*windowspecdefinition\\([^\\)]*\\)"
        .r.findAllIn(p).toSeq
      assert(windows.nonEmpty, s"$q has no window:\n$p")
      assert(windows.forall(_.contains(key)),
        s"$q has a window not keyed by $key:\n$p")
    }
    // q121's quota offsets must broadcast, never sort-merge
    val p121 = plan("q121_quota_select")
    assert(p121.contains("BroadcastHashJoin"), p121)
    assert(!p121.contains("SortMergeJoin"), p121)
  }

  test("round-5b additions keep their ledger shapes: map-only " +
    "projections, partial aggs, broadcast-only joins") {
    // q125 random projection and q127 shard assignment are pure
    // per-row projections — any Join/HashAggregate/Exchange means the
    // map-only claim is wrong
    Seq("q125_random_project", "q127_training_shards").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q plans an agg:\n$p")
    }
    // q128 k-anonymity: one partially-aggregated groupBy, no join
    val p128 = plan("q128_k_anonymity")
    assert(p128.contains("partial_"), s"no partial agg:\n$p128")
    assert(!p128.contains("Join"), s"q128 plans a join:\n$p128")
    // q129 silhouette: centroids ride a broadcast; the n·k scoring rows
    // reduce under a partial min — a SortMergeJoin would mean the corpus
    // shuffles against the centroid table
    val p129 = plan("q129_silhouette")
    assert(p129.contains("Broadcast"), s"centroids not broadcast:\n$p129")
    assert(!p129.contains("SortMergeJoin"), s"corpus shuffles:\n$p129")
    assert(p129.contains("partial_"), s"no partial min:\n$p129")
  }

  test("q135 script profile is map-only; q137 projected ANN never " +
    "sort-merges and bounds its take") {
    val p135 = plan("q135_script_profile")
    assert(!p135.contains("Join"), s"q135 plans a join:\n$p135")
    assert(!p135.contains("HashAggregate"), s"q135 plans an agg:\n$p135")
    val p137 = plan("q137_projected_ann")
    // bucket filter + top-k: the corpus must not shuffle against anything
    assert(!p137.contains("SortMergeJoin"), s"q137 shuffles corpus:\n$p137")
    // r18 single-scan fusion: BOTH k-lists ride one aggregation of
    // bounded topk_by_score states (the TakeOrdered pair each re-ran
    // the scoring scan); no join remains at all
    assert(p137.contains("topk_by_score"),
      s"q137 top-k not the bounded aggregate:\n$p137")
    assert(!p137.contains("Join"), s"q137 plans a join:\n$p137")
  }

  test("multimodal decode family is map-only: no join, no aggregation") {
    // q34 decode, q102 resize, q103 audio frames: per-row/flat-map codec
    // kernels — any Join or HashAggregate would mean stats are being
    // computed relationally from exploded pixels/samples (the shape that
    // shuffles the binary-derived domain)
    Seq("q34_multimodal_features", "q102_image_resize",
      "q103_audio_frames", "q130_image_dhash", "q133_audio_dhash",
      "q134_video_dhash").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q plans an aggregation:\n$p")
    }
    // q132's keeper collapse joins 16-byte fp rows back to ids — the
    // decode itself must still be map-side (no exchange below the hash
    // projection would show as a Sort/Exchange-over-payload; the payload
    // column must not appear above the scan)
    val p132 = plan("q132_image_dedup")
    assert(p132.contains("Join"), s"q132 lost its keeper join:\n$p132")
    assert(!p132.contains("SortMergeJoin") ||
      !p132.contains("payload"), s"q132 shuffles payloads:\n$p132")
  }

  test("q114 substring-dedup rewrite is map-only: no join, no agg, " +
    "no explode") {
    // pass 2 (the returned plan): the duplicate table rides a broadcast
    // inside CleanDupChunks — a Join, HashAggregate, or Generate here
    // would mean the rewrite shuffles document text relationally
    val p = plan("q114_substring_dedup")
    assert(!p.contains("Join"), s"rewrite must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"rewrite must not aggregate:\n$p")
    assert(!p.contains("Generate"), s"rewrite must not explode:\n$p")
  }

  test("q117 intra-doc dedup is one map-only projection: no join, " +
    "no agg, no explode") {
    val p = plan("q117_intradoc_dedup")
    assert(!p.contains("Join"), s"must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"must not aggregate:\n$p")
    assert(!p.contains("Generate"), s"must not explode:\n$p")
  }

  test("q106 PQ encode is a map-only projection — no join, no agg") {
    val p = plan("q106_pq_encode")
    assert(!p.contains("Join"), s"broadcast codebook must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"unexpected aggregation:\n$p")
  }

  test("q110 feature hashing is map-only: the dense kernel replaces the " +
    "explode+groupBy, no exchange, no join") {
    val p = plan("q110_feature_hashing")
    assert(p.contains("hash_bucket_counts"), s"kernel not in plan:\n$p")
    assert(!p.contains("Join"), s"vocabulary-free op must not join:\n$p")
    // r18: the per-(doc, bucket) aggregation is gone — the kernel emits
    // the counts inside the scan stage and only the declared ORDER BY
    // may exchange
    assert(!p.contains("HashAggregate"),
      s"kernel output must not re-aggregate:\n$p")
  }

  test("q112 normalization broadcasts the per-group stats") {
    val p = plan("q112_normalize")
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"|groups|-row stats must never sort-merge:\n$p")
  }

  test("q120 budget selection broadcasts bin offsets; doc windows " +
    "partition by bin") {
    val p = plan("q120_budget_select")
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"|bins|-row offsets must never sort-merge:\n$p")
    // the per-document window must be keyed by the quality bin — a
    // global (unpartitioned) doc window would be the single-task sort
    // this operator exists to avoid
    val docWindow = "Window \\[[^\\]]*n_tokens[^\\]]*\\]".r.findFirstIn(p)
    assert(docWindow.exists(_.contains("quality")),
      s"doc prefix-sum window not partitioned by quality bin:\n$p")
  }

  test("q116 winsorize broadcasts the per-group quantile band") {
    val p = plan("q116_winsorize")
    assert(p.contains("BroadcastHashJoin"), s"band not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"|groups|-row band must never sort-merge:\n$p")
  }

  test("round-9b additions keep their ledger shapes: map-only gates, " +
    "broadcast model, fingerprint-only diff join, bounded fusion") {
    // q149 blocklist and q150 license tagging are stage-1 map-only rules
    Seq("q149_blocklist_gate", "q150_license_detect").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q plans an agg:\n$p")
    }
    // q148 classifier (r18 shape): the |buckets|-row model collects to a
    // literal weight vector and scoring is ONE map-only projection — a
    // dense dot kernel over hash_bucket_counts; no join, no aggregation,
    // no exchange below the declared ORDER BY
    val p148 = plan("q148_quality_classifier")
    assert(p148.contains("dotproduct") &&
      p148.contains("hash_bucket_counts"),
      s"dense scoring kernels not in plan:\n$p148")
    assert(!p148.contains("Join"), s"model must not join:\n$p148")
    assert(!p148.contains("HashAggregate"),
      s"map-only scoring must not aggregate:\n$p148")
    // q147 snapshot diff: one full-outer id join over (id, fp)
    // projections — the document text must never rise above the
    // fingerprint projection into the exchange
    val p147 = plan("q147_snapshot_diff")
    assert(p147.contains("FullOuter"), s"diff lost its outer join:\n$p147")
    assert(!p147.contains("Generate"), s"diff must not explode:\n$p147")
    // q146 fusion: bounded run lists end in one bounded take
    val p146 = plan("q146_rrf_fusion")
    assert(p146.contains("TakeOrderedAndProject"),
      s"fusion top-k not bounded:\n$p146")
  }

  test("round-9c additions keep their ledger shapes: map-only text ops, " +
    "partial-agged counts, rank-capped LM window, digest-class keeper") {
    // q154/q157/q159/q161/q164/q165 are stage-1 map-only projections
    Seq("q154_bpe_encode", "q157_mojibake", "q159_oov_rate",
      "q161_sentence_stats", "q164_normalize_text",
      "q165_anchor_text").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q plans an agg:\n$p")
    }
    // q156 NB train: (label, token) counts map-side combine; the label
    // totals and vocab ride broadcasts
    val p156 = plan("q156_nb_train")
    assert(p156.contains("partial_"), s"no map-side combine:\n$p156")
    assert(p156.contains("BroadcastHashJoin") ||
      p156.contains("BroadcastNestedLoopJoin"),
      s"NB stats not broadcast:\n$p156")
    // q163 bigram LM: the per-context rank must be pruned BEFORE any
    // collection (WindowGroupLimit) and the context totals broadcast
    val p163 = plan("q163_bigram_lm")
    assert(p163.contains("WindowGroupLimit"),
      s"LM rank not pre-capped:\n$p163")
    assert(p163.contains("BroadcastHashJoin"),
      s"context totals not broadcast:\n$p163")
    // q166 keep-latest: exact's digest-class shuffle — one partial
    // max_by aggregation, no window, no join
    val p166 = plan("q166_dedup_latest")
    assert(p166.contains("partial_"), s"no map-side combine:\n$p166")
    assert(!p166.contains("Join"), s"keeper should not join:\n$p166")
    assert(!p166.contains("Window"), s"keeper should not window:\n$p166")
    // q155 pagerank / q158 degrees: no cartesian anywhere in the
    // iteration joins
    Seq("q155_domain_pagerank", "q158_degree_stats").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q goes cartesian:\n$p")
    }
  }

  test("round-9d additions keep their ledger shapes: map-only C4 pass, " +
    "digest-keyed paragraph ownership, rank-capped KMV, window-only split") {
    // q168 C4 line filter: stage-1 map-only — no join, no agg, no window
    val p168 = plan("q168_c4_rules")
    assert(!p168.contains("Join"), s"q168 plans a join:\n$p168")
    assert(!p168.contains("HashAggregate"), s"q168 plans an agg:\n$p168")
    assert(!p168.contains("Window"), s"q168 plans a window:\n$p168")
    // q169 paragraph dedup: ownership reduction is map-side combined,
    // joins are hash joins on the digest / id — never cartesian
    val p169 = plan("q169_paragraph_dedup")
    assert(p169.contains("partial_"), s"no map-side combine:\n$p169")
    assert(!p169.contains("CartesianProduct"), s"q169 cartesian:\n$p169")
    // q170 ppl buckets: the 1-row corpus total rides a broadcast; the
    // only window is the per-stratum ntile
    val p170 = plan("q170_ppl_buckets")
    assert(!p170.contains("CartesianProduct"), s"q170 cartesian:\n$p170")
    assert(p170.contains("BroadcastNestedLoopJoin") ||
      p170.contains("BroadcastHashJoin"),
      s"corpus total not broadcast:\n$p170")
    // q171 KMV: the per-group rank must be pruned map-side before the
    // kth-hash aggregation (WindowGroupLimit), distinct partial-agged
    val p171 = plan("q171_kmv_distinct")
    assert(p171.contains("WindowGroupLimit"),
      s"KMV rank not pre-capped:\n$p171")
    assert(p171.contains("partial_"), s"no map-side combine:\n$p171")
    // q172 stratified split: one window, no join, no agg beyond the
    // window's own count
    val p172 = plan("q172_stratified_split")
    assert(!p172.contains("Join"), s"q172 plans a join:\n$p172")
    // q173 fertility: catalog-sized partial-agged report, no join/window
    val p173 = plan("q173_token_fertility")
    assert(p173.contains("partial_"), s"no map-side combine:\n$p173")
    assert(!p173.contains("Join"), s"q173 plans a join:\n$p173")
    assert(!p173.contains("Window"), s"q173 plans a window:\n$p173")
  }

  test("round-9e additions keep their ledger shapes: joinless ADC with " +
    "bounded take, broadcast sweep, partial-agged reports") {
    // q174 ADC: the corpus never joins anything — codes are a kernel
    // projection, the LUT rides the plan, top-k is one bounded take
    val p174 = plan("q174_pq_adc_topk")
    assert(p174.contains("TakeOrderedAndProject"),
      s"ADC top-k not bounded:\n$p174")
    assert(!p174.contains("Join"), s"ADC plans a join:\n$p174")
    // q175 sweep: the threshold list rides a broadcast; counts are
    // map-side combined; never cartesian
    val p175 = plan("q175_threshold_sweep")
    assert(p175.contains("BroadcastNestedLoopJoin") ||
      p175.contains("BroadcastHashJoin"),
      s"thresholds not broadcast:\n$p175")
    assert(p175.contains("partial_"), s"no map-side combine:\n$p175")
    assert(!p175.contains("CartesianProduct"), s"q175 cartesian:\n$p175")
    // q176 interpolated NLL: same ledger as q109 + a token-domain
    // unigram join — hash joins only
    val p176 = plan("q176_interpolated_nll")
    assert(p176.contains("partial_"), s"no map-side combine:\n$p176")
    assert(!p176.contains("CartesianProduct"), s"q176 cartesian:\n$p176")
    // q177/q178: catalog-sized reports — partial aggs, no window;
    // q178 additionally joins nothing
    val p177 = plan("q177_host_shard_plan")
    assert(p177.contains("partial_"), s"no map-side combine:\n$p177")
    assert(!p177.contains("Window"), s"q177 plans a window:\n$p177")
    val p178 = plan("q178_embedding_audit")
    assert(p178.contains("partial_"), s"no map-side combine:\n$p178")
    assert(!p178.contains("Join"), s"q178 plans a join:\n$p178")
    assert(!p178.contains("Window"), s"q178 plans a window:\n$p178")
  }

  test("round-9f additions keep their ledger shapes: pruned IVF+ADC " +
    "serving, partial-agged audit, one-window span corruption") {
    // q179 IVF+PQ: the served plan is filter + kernel encode + bounded
    // take — the probe selection ran as its own tiny job; no join
    val p179 = plan("q179_ivf_pq_topk")
    assert(p179.contains("TakeOrderedAndProject"),
      s"IVFPQ top-k not bounded:\n$p179")
    assert(!p179.contains("Join"), s"IVFPQ serves with a join:\n$p179")
    // q180 audit: one grouped agg, map-side combined, no join/window
    val p180 = plan("q180_dedup_audit")
    assert(p180.contains("partial_"), s"no map-side combine:\n$p180")
    assert(!p180.contains("Join"), s"q180 plans a join:\n$p180")
    assert(!p180.contains("Window"), s"q180 plans a window:\n$p180")
    // q181 span corruption: one per-doc window (the sentinel counter),
    // partial-agged rebuild, never cartesian
    val p181 = plan("q181_span_corruption")
    assert(p181.contains("Window"), s"sentinel counter missing:\n$p181")
    assert(p181.contains("partial_"), s"no map-side combine:\n$p181")
    assert(!p181.contains("CartesianProduct"), s"q181 cartesian:\n$p181")
  }

  test("round-9g additions keep their ledger shapes: scan-free tuning " +
    "table, partial-agged audits") {
    // q182 S-curve: pure Range union — no file scan anywhere
    val p182 = plan("q182_lsh_curve")
    assert(p182.contains("Range"), s"no range source:\n$p182")
    assert(!p182.toLowerCase.contains("filescan"),
      s"tuning table reads files:\n$p182")
    assert(!p182.contains("Join"), s"q182 plans a join:\n$p182")
    // q183/q184: map-only projections + one combined agg each
    Seq("q183_pii_report", "q184_url_depth").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_"), s"$q no map-side combine:\n$p")
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
    }
  }

  test("round-9h additions keep their ledger shapes: anti-join frontier " +
    "with bounded take, tiny-join centroid drift") {
    // q185 frontier: one url-keyed anti-join, combined count, one take
    val p185 = plan("q185_crawl_frontier")
    assert(p185.contains("LeftAnti"), s"no anti-join:\n$p185")
    assert(p185.contains("TakeOrderedAndProject"),
      s"frontier not bounded:\n$p185")
    assert(p185.contains("partial_"), s"no map-side combine:\n$p185")
    assert(!p185.contains("CartesianProduct"), s"q185 cartesian:\n$p185")
    // q186 drift: two |groups|-row centroid aggs meeting in one tiny
    // equi-join — never cartesian, no window
    val p186 = plan("q186_centroid_drift")
    assert(p186.contains("partial_"), s"no map-side combine:\n$p186")
    assert(!p186.contains("CartesianProduct"), s"q186 cartesian:\n$p186")
    assert(!p186.contains("Window"), s"q186 plans a window:\n$p186")
  }

  test("round-9i additions keep their ledger shapes: bounded skew take, " +
    "rank-capped epoch window, one-pass diversity audit") {
    // q187: combined count + broadcast summary + one bounded take
    val p187 = plan("q187_skew_report")
    assert(p187.contains("partial_"), s"no map-side combine:\n$p187")
    assert(p187.contains("BroadcastNestedLoopJoin") ||
      p187.contains("BroadcastHashJoin"), s"summary not broadcast:\n$p187")
    assert(!p187.contains("CartesianProduct"), s"q187 cartesian:\n$p187")
    // q188: the per-epoch rank is pruned BEFORE materializing the
    // permutation (WindowGroupLimit)
    val p188 = plan("q188_epoch_shuffle")
    assert(p188.contains("WindowGroupLimit"),
      s"epoch rank not pre-capped:\n$p188")
    assert(!p188.contains("Join"), s"q188 plans a join:\n$p188")
    // q189: one aggregation pass, no join/window
    val p189 = plan("q189_l_diversity")
    assert(p189.contains("partial_"), s"no map-side combine:\n$p189")
    assert(!p189.contains("Join"), s"q189 plans a join:\n$p189")
    assert(!p189.contains("Window"), s"q189 plans a window:\n$p189")
  }

  test("round-9j additions keep their ledger shapes: broadcast-total " +
    "balance, reduced-before-join makespan") {
    // q190: one combined agg + broadcast 1-row total, no window
    val p190 = plan("q190_shard_balance")
    assert(p190.contains("partial_"), s"no map-side combine:\n$p190")
    assert(p190.contains("BroadcastNestedLoopJoin") ||
      p190.contains("BroadcastHashJoin"), s"total not broadcast:\n$p190")
    assert(!p190.contains("Window"), s"q190 plans a window:\n$p190")
    // q191: URLs reduce to per-host counts BEFORE the robots join, and
    // the robots side rides a broadcast
    val p191 = plan("q191_fetch_makespan")
    assert(p191.contains("partial_"), s"no map-side combine:\n$p191")
    assert(p191.contains("BroadcastHashJoin"),
      s"robots not broadcast:\n$p191")
    assert(!p191.contains("CartesianProduct"), s"q191 cartesian:\n$p191")
  }

  test("round-9k compositions keep their ledger shapes: broadcast LM " +
    "total in the bucket report, join-free anchor rollup") {
    val p192 = plan("q192_ccnet_report")
    assert(p192.contains("partial_"), s"no map-side combine:\n$p192")
    assert(!p192.contains("CartesianProduct"), s"q192 cartesian:\n$p192")
    assert(p192.contains("BroadcastNestedLoopJoin") ||
      p192.contains("BroadcastHashJoin"),
      s"corpus total not broadcast:\n$p192")
    val p193 = plan("q193_anchor_domains")
    assert(p193.contains("partial_"), s"no map-side combine:\n$p193")
    assert(!p193.contains("Join"), s"q193 plans a join:\n$p193")
    assert(!p193.contains("Window"), s"q193 plans a window:\n$p193")
  }

  test("round-9l additions keep their ledger shapes: map-only code " +
    "router and table extraction") {
    Seq("q194_code_detect", "q195_table_extract").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q plans an agg:\n$p")
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
    }
  }

  test("round-10 additions keep their ledger shapes: broadcast model in " +
    "the multi-class router, map-only WET scan and CDC chunking") {
    // q198: the |labels|·buckets model must BROADCAST (never shuffle the
    // corpus against it) and the feature counts partial-agg map-side
    val p198 = plan("q198_multiclass_linear")
    assert(p198.contains("BroadcastHashJoin") ||
      p198.contains("BroadcastNestedLoopJoin"),
      s"model not broadcast:\n$p198")
    assert(p198.contains("partial_"), s"no map-side combine:\n$p198")
    assert(!p198.contains("CartesianProduct"), s"q198 cartesian:\n$p198")
    // q199/q201: pure scans — no join, no aggregation, no window
    Seq("q199_wet_ingest", "q201_cdc_chunks").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q plans a join:\n$p")
      assert(!p.contains("HashAggregate"), s"$q plans an agg:\n$p")
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
    }
    // q200: WAT link extraction is scan + generate only
    val p200 = plan("q200_wat_links")
    assert(!p200.contains("HashAggregate"), s"q200 plans an agg:\n$p200")
    assert(p200.contains("Generate"), s"q200 missing the explode:\n$p200")
    // q211: the per-group A-ES sample must pre-cap map-side — the
    // WindowGroupLimit Partial phase, the per-domain-cap plan shape
    val p211 = plan("q211_weighted_sample_per_group")
    assert(p211.contains("WindowGroupLimit"),
      s"per-group sample not group-limit pruned:\n$p211")
  }

  test("round-11 additions keep their ledger shapes: map-only FIM, " +
    "bounded matryoshka with broadcast shortlist, partial-agged " +
    "best-of-N with no window, one shard exchange for blocks") {
    // q226 FIM: pure per-row projection — no join, agg, window, exchange
    val p226 = plan("q226_fim_transform")
    assert(!p226.contains("Join"), s"q226 plans a join:\n$p226")
    assert(!p226.contains("HashAggregate"), s"q226 plans an agg:\n$p226")
    assert(!p226.contains("Window"), s"q226 plans a window:\n$p226")
    // q227 matryoshka: both stages bounded TakeOrdered, the shortlist
    // rides a broadcast (semi) join, never a shuffle join
    val p227 = plan("q227_matryoshka_topk")
    assert(p227.contains("TakeOrderedAndProject"),
      s"q227 missing bounded take:\n$p227")
    assert(p227.contains("BroadcastHashJoin"),
      s"q227 shortlist not broadcast:\n$p227")
    assert(!p227.contains("SortMergeJoin"),
      s"q227 shuffle-joins the shortlist:\n$p227")
    // q230 best-of-N: ONE aggregation layer with map-side combine
    // (partial max_by/min_by structs), no window, no sort beyond the
    // final presentation orderBy
    val p230 = plan("q230_best_of_n")
    assert(p230.contains("partial_"), s"q230 no map-side combine:\n$p230")
    assert(!p230.contains("Window"), s"q230 plans a window:\n$p230")
    // q225 blocks: the ONLY exchanges are the shard hash partitioning
    // for the cumsum window (+ AQE final presentation sort) — text
    // never moves: no text column in any Exchange output
    val p225 = plan("q225_block_segments")
    assert(p225.contains("Window"), s"q225 missing the cumsum:\n$p225")
    assert(!"Exchange [^\\n]*\\btext\\b".r.findFirstIn(p225).isDefined,
      s"q225 shuffles text:\n$p225")
    // q228 preference audit: response text reaches no Exchange — every
    // shuffle key/payload is a digest or count
    val p228 = plan("q228_preference_audit")
    assert(!"Exchange [^\\n]*\\b(chosen|rejected|sample)\\b".r
      .findFirstIn(p228).isDefined, s"q228 shuffles response text:\n$p228")
  }

  test("round-12 additions keep their ledger shapes: kernel BPE encode " +
    "is map-only with no inlined merge literals") {
    // q269: the 80-merge table must ride the broadcast kernel — the
    // plan carries the bpe_encode_word handle and none of the merge
    // pair literals (' t  h ' is what the literal fold would inline);
    // the encode itself is scan + generate, no join/agg/window
    val p269 = plan("q269_bpe_encode_kernel")
    assert(p269.contains("bpe_encode_word"),
      s"q269 not on the kernel path:\n$p269")
    assert(!p269.contains(" t  h "),
      s"q269 inlines merge literals:\n$p269")
    assert(!p269.contains("Join"), s"q269 plans a join:\n$p269")
    assert(!p269.contains("HashAggregate"), s"q269 plans an agg:\n$p269")
    assert(!p269.contains("Window"), s"q269 plans a window:\n$p269")
    assert(p269.contains("Generate"), s"q269 missing the explode:\n$p269")
    // q272 exact-substring miner: digest equi-join (never cartesian),
    // partial-agged df cap, broadcast anti-join for the hot grams,
    // document text absent from every Exchange (only (h, id, pos)
    // longs shuffle)
    val p272 = plan("q272_exact_substr")
    assert(!p272.contains("CartesianProduct"), s"q272 cartesian:\n$p272")
    assert(p272.contains("partial_"), s"q272 no map-side combine:\n$p272")
    assert(p272.contains("BroadcastHashJoin"),
      s"q272 hot-gram cap not broadcast:\n$p272")
    assert(!"Exchange [^\\n]*\\btext\\b".r.findFirstIn(p272).isDefined,
      s"q272 shuffles text:\n$p272")
  }

  test("round-13 additions keep their ledger shapes: kernel dominant " +
    "dispatch, broadcast DSIR models, top-k without a full sort, " +
    "map-only CDX parse") {
    // q276: sentence + repetition dispatch is map-only over the
    // DominantScript kernel — no regexp strip-and-measure chain, no
    // window; the only join is the per-doc stat join on doc_id
    val p276 = plan("q276_script_sentences")
    assert(p276.contains("dominant_script"),
      s"q276 not on the kernel dispatch:\n$p276")
    assert(!p276.contains("Window"), s"q276 plans a window:\n$p276")
    // q282 DSIR: both |buckets|-row sides broadcast; no cartesian
    // beyond the declared 1-row consts cross join; token counts
    // partial-agged
    val p282 = plan("q282_dsir_weights")
    assert(p282.contains("BroadcastHashJoin") ||
      p282.contains("BroadcastNestedLoopJoin"),
      s"q282 models not broadcast:\n$p282")
    assert(p282.contains("partial_"),
      s"q282 counts not partial-agged:\n$p282")
    assert(!p282.contains("CartesianProduct"), s"q282 cartesian:\n$p282")
    assert(!p282.contains("SortMergeJoin"),
      s"q282 shuffles a model side:\n$p282")
    // q283: global top-k plans as TakeOrderedAndProject, never a full
    // sort of the weight table
    val p283 = SparkEntry.queries("q283_dsir_select")(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(p283.contains("TakeOrderedAndProject"),
      s"q283 missing the bounded top-k:\n$p283")
    // q284: the CDX parse is scan + projection — no join, no agg, no
    // hash shuffle (the orderBy range-partitions for presentation only)
    val p284 = plan("q284_cdx_parse")
    assert(!p284.contains("Join") && !p284.contains("HashAggregate") &&
      !p284.contains("hashpartitioning"),
      s"q284 should be a pure projection:\n$p284")
    // q286/q289/q290: map-only batteries — no join, no agg, no window
    // anywhere (the generate in q290 is a per-row explode)
    for (q <- Seq("q286_code_quality", "q289_markdown_stats",
        "q290_fenced_blocks")) {
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("HashAggregate") &&
        !p.contains("Window"), s"$q should be map-only:\n$p")
    }
    // q287: ONE doc-keyed aggregation with map-side combine — no
    // window, no join, the six-LONG-sum state the ledger row claims
    val p287 = plan("q287_loss_trajectories")
    assert(p287.contains("partial_"),
      s"q287 sums not partial-agged:\n$p287")
    assert(!p287.contains("Window") && !p287.contains("Join"),
      s"q287 plans a window or join:\n$p287")
    // q291: scan + |spec|-explode + ONE partial-agged aggregation —
    // no window, no join, no cartesian
    val p291 = plan("q291_canary_manifest")
    assert(p291.contains("partial_"),
      s"q291 not partial-agged:\n$p291")
    assert(!p291.contains("Window") && !p291.contains("Join"),
      s"q291 plans a window or join:\n$p291")
    // q292: the manifest-vs-audit join is over two |spec|-row
    // aggregates — never a cartesian or a sort-merge shuffle
    val p292 = plan("q292_canary_exposure")
    assert(!p292.contains("CartesianProduct") &&
      !p292.contains("SortMergeJoin"),
      s"q292 shuffles a spec-sized side:\n$p292")
    // q293: the manifest is ONE aggregation over the packing rows —
    // no window, no join; the in-pack scan rides the collected list
    val p293 = plan("q293_pack_manifest")
    assert(!p293.contains("Window") && !p293.contains("Join"),
      s"q293 plans a window or join:\n$p293")
    // q294 byte-level encode: the q269 shape — broadcast kernel (both
    // the gpt2_bytes map and bpe_encode_word handles present, zero
    // merge-pair literals), scan + generate, no join/agg/window
    val p294 = plan("q294_bpe_byte_encode")
    assert(p294.contains("gpt2_bytes") &&
      p294.contains("bpe_encode_word"),
      s"q294 not on the byte-level kernel path:\n$p294")
    assert(!p294.contains(" h  e "),
      s"q294 inlines merge literals:\n$p294")
    assert(!p294.contains("Join") && !p294.contains("HashAggregate") &&
      !p294.contains("Window"),
      s"q294 plans a join/agg/window:\n$p294")
  }

  test("giant-group quantile fallback: no window sort, cuts broadcast") {
    // the routed cut-point path over a real parquet scan: one
    // partial-aggregated percentile pass + broadcast join + map-side bin
    // — no Window and no per-group Sort anywhere in the plan
    val events = graft.io.Readers.table(spark, dir, "events")
    val p = graft.ops.Windows.quantileBucketsByCutpoints(
      events, Seq("event_type"), "value", 8, accuracy = 10000)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Window"), s"fallback plans a window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cuts not broadcast:\n$p")
    assert(p.contains("partial_"), s"percentiles not partial-agged:\n$p")
  }

  test("q313 gate audit is one aggregation pass — a single scan " +
    "regardless of gate count, no join") {
    val p = plan("q313_gate_audit")
    val scans = "FileScan|BatchScan".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), s"gates must partial-agg:\n$p")
  }

  test("q311 html meta is map-only: no join, no aggregation, no hash " +
    "shuffle") {
    val p = plan("q311_html_meta")
    assert(!p.contains("Join") && !p.contains("Aggregate") &&
      !p.contains("hashpartitioning"),
      s"q311 should be a pure projection:\n$p")
  }

  test("q310 keyword gate is map-only and rides the automaton kernel " +
    "(one pass, not K chained contains)") {
    val p = plan("q310_url_keywords")
    assert(!p.contains("Join") && !p.contains("Aggregate") &&
      !p.contains("hashpartitioning"),
      s"q310 should be a pure projection:\n$p")
    assert(p.contains("multi_matches"),
      s"q310 should ride the kernel:\n$p")
    assert(!p.contains("Contains(url"),
      s"no chained contains in the plan:\n$p")
  }

  test("q309 frontier: the robots rules side is BROADCAST (never a " +
    "cartesian against the URL set), the captured set joins anti") {
    val p = plan("q309_frontier_sitemap")
    assert(!p.contains("CartesianProduct"),
      s"rules must broadcast, not cartesian:\n$p")
    assert(p.contains("Broadcast"), s"expected a broadcast join:\n$p")
    assert(p.contains("LeftAnti"), s"captured dedup should be anti:\n$p")
  }

  test("q308 brier is ONE partial-agged integer aggregation: no join, " +
    "no window") {
    val p = plan("q308_brier")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q308 should be one aggregation:\n$p")
    assert(p.contains("partial_"), s"brier sums must partial-agg:\n$p")
  }

  test("q307 sitemap parse is map-only: no join, no aggregation, no " +
    "hash shuffle — the only Generate is the per-entry posexplode") {
    val p = plan("q307_sitemap_entries")
    assert(!p.contains("Join") && !p.contains("Aggregate") &&
      !p.contains("hashpartitioning"),
      s"q307 should be a pure projection:\n$p")
  }

  test("q306 z-order key is map-only pure integer math: no join, no " +
    "aggregation, no hash shuffle, no UDF or kernel object") {
    val p = plan("q306_zorder_key")
    assert(!p.contains("Join") && !p.contains("Aggregate") &&
      !p.contains("hashpartitioning"),
      s"q306 should be a pure projection:\n$p")
    assert(p.contains("shiftleft") || p.contains("<<"),
      s"expected plan-level shifts:\n$p")
  }

  test("q305 NFC is map-only: no join, no aggregation, no hash " +
    "shuffle; rides the quick-check kernel") {
    val p = plan("q305_unicode_nfc")
    assert(!p.contains("Join") && !p.contains("Aggregate") &&
      !p.contains("hashpartitioning"),
      s"q305 should be a pure projection:\n$p")
    assert(p.contains("unicode_normalize"),
      s"q305 should ride the kernel:\n$p")
  }

  test("q304 covariance is ONE typed aggregation with map-side " +
    "partials — no join, no per-pair explode before the agg") {
    val p = plan("q304_embedding_covariance")
    assert(!p.contains("Join"), s"covariance should not join:\n$p")
    assert(p.contains("ObjectHashAggregate") && p.contains("partial"),
      s"co-moments must partial-agg:\n$p")
    // the only Generate is the post-agg triangle unfold of ONE row
    assert("Exchange".r.findAllIn(p).length <= 2,
      s"at most the agg's single-partition exchange (+sort):\n$p")
  }

  test("q302/q303 BLEU rides the one-pass kernel (no gram explode — " +
    "the only Generate is the 4-level unnest) and q303 aggregates " +
    "with map-side partials") {
    val p2 = plan("q302_bleu_ngrams")
    assert(p2.contains("bleu_stats"), s"q302 should ride the kernel:\n$p2")
    val p3 = plan("q303_corpus_bleu")
    assert(p3.contains("bleu_stats"), s"q303 should ride the kernel:\n$p3")
    assert(p3.contains("partial_"),
      s"q303 corpus sums must partial-agg:\n$p3")
  }

  test("q300/q301 WordPiece encode is map-only: no join, no " +
    "aggregation, no hash shuffle; the vocab rides the broadcast " +
    "kernel, not plan literals") {
    Seq("q300_wordpiece_encode", "q301_wordpiece_ids").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join") && !p.contains("Aggregate") &&
        !p.contains("hashpartitioning"),
        s"$q should be a pure projection:\n$p")
      assert(p.contains("wordpiece_encode_word"),
        s"$q should ride the broadcast kernel:\n$p")
    }
  }
}
