package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instruction/SFT-data operators — the post-pretraining half of a
  * training-data pipeline: multi-turn conversations as
  * `ARRAY<STRUCT<role STRING, content STRING>>` columns, validated,
  * rendered to training strings, and deduplicated. Everything here is
  * map-only column work plus at most one digest-keyed window — the same
  * 100 TB posture as the stage-1 text rules (conversation payloads never
  * shuffle; the dedup shuffles 32-byte digests).
  */
object Chat {

  /** Per-conversation structure report: turn counts by role, whether
    * roles strictly alternate, whether the conversation opens with a
    * user turn, and exact character volume per side — the validation
    * pass an SFT corpus runs before any template rendering (malformed
    * role sequences poison loss masking downstream). One map-only
    * projection; `alternates`/`starts_with_user` are 0/1 ints (the
    * cross-engine boolean convention). */
  def conversationStats(df: DataFrame, idCol: String = "doc_id",
                        turnsCol: String = "turns"): DataFrame = {
    val t = col(turnsCol)
    val roles = transform(t, x => x.getField("role"))
    val breaks = filter(sequence(lit(1), size(t) - 1),
      i => element_at(roles, i + 1) === element_at(roles, i))
    // coalesce per turn: one NULL content must not NULL the whole sum
    def charsOf(role: String): Column =
      aggregate(filter(t, x => x.getField("role") === role), lit(0L),
        (acc, x) => acc + coalesce(length(x.getField("content")), lit(0L)))
    df.select(col(idCol),
      size(t).cast("long").as("n_turns"),
      size(filter(roles, r => r === "user")).cast("long").as("n_user"),
      size(filter(roles, r => r === "assistant")).cast("long")
        .as("n_assistant"),
      (size(t) > 1 && size(breaks) === 0).cast("int").as("alternates"),
      (size(t) > 0 &&
        element_at(roles, 1) === "user").cast("int").as("starts_with_user"),
      charsOf("user").as("chars_user"),
      charsOf("assistant").as("chars_assistant"))
  }

  /** Render a turn array into the flat training string:
    * `<|role|>content` per turn, concatenated in order — the minimal
    * chat-template shape (swap the delimiters for a model family's own
    * special tokens). Pure column expression, codegen'd, map-only. */
  def renderTemplate(turns: Column): Column =
    array_join(transform(turns, x =>
      concat(lit("<|"), x.getField("role"), lit("|>"),
        x.getField("content"))), "")

  /** PREFERENCE-PAIR audit — the validation pass a DPO/RLHF reward
    * corpus needs before training: per (prompt, chosen, rejected) pair,
    *  - `degenerate`: chosen ≡ rejected after the normalization
    *    [[dedupConversations]] uses (lower + whitespace collapse) — a
    *    pair that teaches nothing and divides by zero in some losses;
    *  - `contradicted`: some OTHER pair ranks the same two responses
    *    the opposite way for the same prompt (the label-noise class
    *    that actively poisons a Bradley-Terry fit) — detected by
    *    joining each pair's forward digest md5(p‖c‖r) against the
    *    corpus's REVERSED digests md5(p‖r‖c), the reversed table built
    *    from non-degenerate pairs only (a degenerate's reverse equals
    *    its own forward — without the exclusion every degenerate would
    *    "contradict" itself);
    *  - `prompt_dups`: how many pairs share this pair's normalized
    *    prompt (loss weighting / dedup exposure);
    *  - `keep`: first owner (min id) of its exact forward digest with
    *    neither flag — the training-set verdict.
    * Everything shuffles 32-byte digests, never response text: one
    * digest-keyed count for prompts, one for reversed digests, one
    * ownership window on the forward digest. */
  def preferenceAudit(df: DataFrame, idCol: String = "pair_id",
                      promptCol: String = "prompt",
                      chosenCol: String = "chosen",
                      rejectedCol: String = "rejected"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def norm(c: Column): Column =
      md5(regexp_replace(lower(coalesce(c, lit(""))), "\\s+", " "))
    val d = df.select(col(idCol), norm(col(promptCol)).as("_pd"),
        norm(col(chosenCol)).as("_cd"), norm(col(rejectedCol)).as("_rd"))
      .withColumn("_fwd", md5(concat(col("_pd"), col("_cd"), col("_rd"))))
      .withColumn("_rev", md5(concat(col("_pd"), col("_rd"), col("_cd"))))
      .withColumn("degenerate", (col("_cd") === col("_rd")).cast("int"))
    val promptCounts = d.groupBy(col("_pd"))
      .agg(count(lit(1)).as("prompt_dups"))
    val revCounts = d.filter(col("degenerate") === 0)
      .groupBy(col("_rev").as("_fwd"))
      .agg(count(lit(1)).as("_n_rev"))
    val w = Window.partitionBy("_fwd").orderBy(col(idCol))
    d.join(promptCounts, "_pd")
      .join(revCounts, Seq("_fwd"), "left")
      .withColumn("contradicted",
        (coalesce(col("_n_rev"), lit(0L)) > 0).cast("int"))
      .withColumn("keep",
        (row_number().over(w) === 1 && col("degenerate") === 0 &&
          col("contradicted") === 0).cast("int"))
      .select(col(idCol), col("degenerate"), col("contradicted"),
        col("prompt_dups"), col("keep"))
  }

  /** BEST-OF-N selection over scored samples — the rejection-sampling /
    * DPO-pair construction step: given N scored candidate responses per
    * prompt, emit one row per prompt with the argmax sample as `chosen`
    * and the argmin as `rejected`, the score margin, and the candidate
    * count. Ties are deterministic and OPPOSED: chosen breaks to the
    * lowest sample id, rejected to the highest — so a prompt whose
    * candidates all score equal still yields two distinct samples
    * rather than a self-pair. Prompts with
    * fewer than `minSamples` candidates are dropped (a 1-sample
    * "pair" is degenerate by construction — [[preferenceAudit]] would
    * flag it anyway; filtering here keeps the pair table clean).
    * Rows with a null score never win or lose — they only count.
    *
    * One aggregation over (prompt, sample): max_by/min_by structs are
    * map-side combined, so only |prompts| rows survive the shuffle and
    * sample text moves once inside the agg buffers — no window, no
    * self-join, no sort. */
  def bestOfN(df: DataFrame, promptCol: String = "prompt_id",
              sampleCol: String = "sample_id",
              textCol: String = "sample",
              scoreCol: String = "score",
              minSamples: Int = 2): DataFrame = {
    require(minSamples >= 2, s"minSamples must be >= 2, got $minSamples")
    // orderable struct: score first, then NEGATED id so that max picks
    // (highest score, lowest id) and min picks (lowest score, highest
    // id) — the two tie rules documented above
    def key(sign: Int): Column =
      struct(col(scoreCol).as("s"),
        (col(sampleCol) * lit(sign)).as("i"), col(textCol).as("t"))
    df.filter(col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_scored"),
        max(key(-1)).as("_hi"), min(key(-1)).as("_lo"))
      .join(df.groupBy(col(promptCol))
        .agg(count(lit(1)).as("n_samples")), promptCol)
      .filter(col("n_scored") >= minSamples)
      .select(col(promptCol), col("n_samples"), col("n_scored"),
        col("_hi.t").as("chosen"), col("_lo.t").as("rejected"),
        (col("_hi.s") - col("_lo.s")).as("margin"))
  }

  /** LOSS-MASK manifest for SFT training — for each turn, the character
    * span its CONTENT occupies inside the [[renderTemplate]] string,
    * plus the `train` verdict (1 for assistant content, 0 otherwise):
    * exactly what the collator needs to mask user turns and role tags
    * out of the loss (training on user text is the classic SFT leak).
    * Spans are 0-based, end-exclusive, and start after the turn's
    * `<|role|>` tag, so `rendered.substring(start, end)` is the turn's
    * content verbatim; a rendered+masked pair round-trips by
    * construction. A NULL content drops its whole turn from
    * [[renderTemplate]]'s output (concat nulls the element, array_join
    * skips it), so such turns get a zero-length span at the drop point —
    * offsets stay render-aligned either way. One row per
    * (conversation, turn).
    *
    * Map-only: offsets come from an in-row prefix sum over the turn
    * lengths (quadratic in the TURN COUNT of one conversation — tens at
    * most, bounded by the chat format, never by corpus size); nothing
    * shuffles at any scale. */
  def lossMaskSpans(df: DataFrame, idCol: String = "doc_id",
                    turnsCol: String = "turns"): DataFrame = {
    val t = col(turnsCol)
    // a NULL content nulls the turn's concat element and array_join
    // drops it from the rendered string — charge such turns ZERO length
    // (tag included) so offsets stay aligned with renderTemplate
    val lens = transform(t, x =>
      when(x.getField("content").isNull, lit(0))
        .otherwise(length(x.getField("role")) + lit(4) + // <| |> tags
          length(x.getField("content"))))
    val rows = transform(sequence(lit(1), size(t)), i => {
      val turn = element_at(t, i)
      val before = aggregate(slice(lens, lit(1), i - 1), lit(0L),
        (acc, x) => acc + x)
      val start = before + when(turn.getField("content").isNull, lit(0L))
        .otherwise(length(turn.getField("role")).cast("long") + 4L)
      struct((i - 1).cast("int").as("turn"),
        turn.getField("role").as("role"),
        start.as("start_char"),
        (start + coalesce(length(turn.getField("content")).cast("long"),
          lit(0L))).as("end_char"),
        (turn.getField("role") === "assistant").cast("int").as("train"))
    })
    df.select(col(idCol), explode(rows).as("s"))
      .select(col(idCol), col("s.turn").as("turn"),
        col("s.role").as("role"), col("s.start_char").as("start_char"),
        col("s.end_char").as("end_char"), col("s.train").as("train"))
  }

  /** Conversation-level exact dedup: digest the WHITESPACE/CASE-
    * normalized rendered conversation (two users pasting the same
    * dialogue with different spacing collapse), keep the first owner
    * (min id). Returns the input plus (rendered, digest, keep) — one
    * digest-keyed `row_number` window, 32-byte keys, payloads never
    * shuffle twice. */
  def dedupConversations(df: DataFrame, idCol: String = "doc_id",
                         turnsCol: String = "turns"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rendered = renderTemplate(col(turnsCol))
    val digest = md5(regexp_replace(lower(rendered), "\\s+", " "))
    val w = Window.partitionBy("digest").orderBy(col(idCol))
    df.withColumn("rendered", rendered)
      .withColumn("digest", digest)
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
  }

  /** MINIMUM-BAYES-RISK selection over candidate responses — the
    * score-free complement of [[bestOfN]]: with no reward model, pick
    * the CONSENSUS candidate — the one maximizing expected utility
    * Σ_{c'≠c} F1(c, c') against its own sampling distribution (the MBR
    * decoding rule, with the multiset-unigram F1 of the ROUGE-1 gate as
    * the utility). Emits one row per candidate — prompt, sample id,
    * token count, utility, and a `selected` flag (ties break to the
    * lowest sample id; a no-overlap or singleton candidate scores 0 and
    * a singleton prompt selects itself) — so the caller gets both the
    * winner and the full consensus profile.
    *
    * Bit-portable: overlaps and lengths are exact integers, each F1 is
    * ONE IEEE division, and the per-candidate Σ folds opponents in
    * sample-id order. Scale shape: the pairwise join is keyed on
    * (prompt, token) — never across prompts — so pair volume is bounded
    * by N²·|distinct tokens per prompt| with N = samples-per-prompt, a
    * decoding-time constant (4-16), not a corpus variable; everything
    * downstream is partial-agged counts plus one per-prompt rank window
    * over N-row groups. Candidate text never moves — only token counts
    * and 8-byte ids shuffle. */
  def mbrSelect(df: DataFrame, promptCol: String = "prompt_id",
                sampleCol: String = "sample_id",
                textCol: String = "sample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextOps
    val base = df.filter(col(textCol).isNotNull)
      .select(col(promptCol).as("p"), col(sampleCol).as("sid"),
        col(textCol).as("txt"))
    val tok = base
      .select(col("p"), col("sid"),
        explode(filter(TextOps.wsTokens(lower(col("txt"))),
          w => length(w) > 0)).as("token"))
      .groupBy("p", "sid", "token").agg(count(lit(1)).as("c"))
    val lens = tok.groupBy("p", "sid").agg(sum("c").as("l"))
    val ov = tok.select(col("p"), col("sid").as("sa"), col("token"),
        col("c").as("ca"))
      .join(tok.select(col("p"), col("sid").as("sb"), col("token"),
        col("c").as("cb")), Seq("p", "token"))
      .filter(col("sa") =!= col("sb"))
      .groupBy("p", "sa", "sb").agg(sum(least(col("ca"), col("cb"))).as("o"))
    val fa = ov
      .join(lens.select(col("p"), col("sid").as("sa"), col("l").as("la")),
        Seq("p", "sa"))
      .join(lens.select(col("p"), col("sid").as("sb"), col("l").as("lb")),
        Seq("p", "sb"))
      .withColumn("f1", (col("o") * 2).cast("double")
        / (col("la") + col("lb")).cast("double"))
    val util = fa.groupBy(col("p"), col("sa").as("sid"))
      .agg(aggregate(array_sort(collect_list(struct(col("sb"), col("f1")))),
        lit(0.0), (acc, x) => acc + x.getField("f1")).as("util"))
    val w = Window.partitionBy(promptCol)
      .orderBy(col("mbr_utility").desc, col(sampleCol).asc)
    base.select(col("p"), col("sid"))
      .join(lens, Seq("p", "sid"), "left")
      .join(util, Seq("p", "sid"), "left")
      .select(col("p").as(promptCol), col("sid").as(sampleCol),
        coalesce(col("l"), lit(0L)).as("n_tokens"),
        coalesce(col("util"), lit(0.0)).as("mbr_utility"))
      .withColumn("selected", (row_number().over(w) === 1).cast("int"))
  }

  /** BRADLEY-TERRY strength fit over pairwise preference outcomes — the
    * arena-style rating step that turns a corpus of (model_a, model_b,
    * winner) comparisons into per-model strengths (the scores behind
    * "chatbot arena" leaderboards, and the latent model DPO assumes —
    * [[preferenceAudit]] flags the label noise that poisons this fit;
    * this is the fit). Runs `iterations` rounds of Hunter's MM update
    * p_i ← W_i / Σ_j n_ij/(p_i+p_j) from a flat p⁰ = 1 start: each
    * round is monotone in the likelihood, and a FIXED unrolled count
    * keeps the whole fit oracle-replayable (the [[graft.ops.Graph]]
    * hitsScores convention). Bit-portable by construction: W_i and
    * n_ij are exact integers, every per-pair term is ONE IEEE division,
    * and the Σ over opponents is a sequential fold in opponent order
    * (never a parallel sum — the domainReweight rule). Models with zero
    * wins rate 0 after round 1; a pair of zero-rated opponents
    * contributes a zero term rather than 0/0 (both sides guard the
    * division). Ratings are reported UNNORMALIZED — fixed-round MM is
    * scale-stable from the flat start, and any consumer normalization
    * (anchor model, geometric mean) is one more division downstream.
    *
    * Scale shape: one pass over the match table builds the (i, j)
    * opponent-count matrix — the only corpus-sized shuffle, keyed on
    * model ids, partial-agged map-side. Everything after lives on the
    * |models|- and |models|²-sized tables (tiny by construction —
    * raters rank tens of models over millions of matches): per-round
    * joins broadcast the rating vector, localCheckpoint cuts the loop
    * lineage. Match volume never re-enters the loop. */
  def bradleyTerry(matches: DataFrame, aCol: String = "model_a",
                   bCol: String = "model_b", winnerCol: String = "winner",
                   iterations: Int = 2): DataFrame = {
    val m = matches.filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(winnerCol).isNotNull && col(aCol) =!= col(bCol))
      .select(col(aCol).as("a"), col(bCol).as("b"), col(winnerCol).as("w"))
    val nm = m.select(col("a").as("i"), col("b").as("j"))
      .union(m.select(col("b").as("i"), col("a").as("j")))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
    val wins = m.groupBy(col("w").as("model")).agg(count(lit(1)).as("wins"))
    bradleyTerryFromCounts(nm, wins, iterations)
  }

  /** The [[bradleyTerry]] MM loop from PRE-AGGREGATED sufficient
    * statistics — the entry point for incremental/streaming arenas
    * ([[graft.streaming.Streaming.arenaLeaderboardForeachBatch]] folds
    * each micro-batch into a stored (i, j, n) + (model, wins) state and
    * re-fits from here): `pairCounts` is the symmetric opponent matrix
    * (i, j, n — both orientations present), `wins` the per-model win
    * totals (extra keys — ties, invalid verdicts — are dropped by the
    * model-domain join, mirroring the batch builder). Bit-identical to
    * the batch path given equal counts: the fit consumes ONLY these
    * statistics, every fold is opponent-ordered, and the match volume
    * behind the counts never matters. */
  def bradleyTerryFromCounts(pairCounts: DataFrame, wins: DataFrame,
                             iterations: Int = 2,
                             driverMaxPairs: Long =
                               Graph.defaultDriverMaxEdges): DataFrame = {
    require(iterations >= 1 && iterations <= 4,
      "iterations out of the unrolled-oracle range")
    import org.apache.spark.storage.StorageLevel
    val nm = pairCounts.select(col("i"), col("j"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Small-matrix driver fast path (the Graph.pageRank gate applied to
    // the |models|² opponent matrix — "tiny by construction" per the
    // scale note above, so this is the path real arenas take): the MM
    // fold is ALREADY sequential in opponent order by spec, so the
    // driver replay — same sorted-j fold, same guarded divisions —
    // is bit-identical to the distributed loop. Above the gate the
    // distributed loop runs unchanged.
    if (driverMaxPairs > 0 && nm.count() <= driverMaxPairs) {
      import scala.collection.mutable
      val spark = pairCounts.sparkSession
      val iType = nm.schema.fields(0).dataType
      val jOrd = Graph.anyOrdering(nm.schema.fields(1).dataType)
      val rows = nm.collect().map(r =>
        (r.get(0), r.get(1), r.get(2).asInstanceOf[Number].longValue))
      nm.unpersist(false)
      val winsMap = mutable.HashMap.empty[Any, Long]
      wins.select(col("model"), col("wins")).collect().foreach { r =>
        winsMap.update(r.get(0), r.get(1).asInstanceOf[Number].longValue)
      }
      val models = mutable.LinkedHashSet.empty[Any]
      rows.foreach { case (i, _, _) => models += i }
      // per-i adjacency in the array_sort order (j ascending, nulls last)
      val adj = mutable.LinkedHashMap.empty[Any, Array[(Any, Long)]]
      models.foreach { i => adj.update(i, Array.empty) }
      val grouped = rows.groupBy(_._1)
      grouped.foreach { case (i, rs) =>
        val pairs = rs.map(r => (r._2, r._3))
        adj.update(i, jOrd match {
          case Some(o) => pairs.sortWith((a, b) => o.compare(a._1, b._1) < 0)
          case None => pairs
        })
      }
      var rating = mutable.HashMap.empty[Any, Double]
      models.foreach(m => rating.update(m, 1.0))
      for (_ <- 1 to iterations) {
        val next = mutable.HashMap.empty[Any, Double]
        models.foreach { i =>
          rating.get(i).foreach { ri =>
            var denom = 0.0
            var any = false
            adj(i).foreach { case (j, n) =>
              // inner-join semantics: pairs whose j carries no current
              // rating row drop out of the fold entirely
              rating.get(j).foreach { rj =>
                val t = if (ri + rj > 0) n.toDouble / (ri + rj) else 0.0
                denom += t
                any = true
              }
            }
            if (any)
              next.update(i,
                if (denom > 0) winsMap.getOrElse(i, 0L).toDouble / denom
                else 0.0)
          }
        }
        rating = next
      }
      val nMatches = mutable.HashMap.empty[Any, Long]
      rows.foreach { case (i, _, n) =>
        nMatches.update(i, Math.addExact(nMatches.getOrElse(i, 0L), n))
      }
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      import scala.jdk.CollectionConverters._
      val out = models.toSeq.filter(rating.contains).map { m =>
        Row(m, nMatches(m), winsMap.getOrElse(m, 0L), rating(m))
      }
      return spark.createDataFrame(out.asJava,
        StructType(Seq(StructField("model", iType),
          StructField("n_matches", LongType),
          StructField("wins", LongType),
          StructField("rating", DoubleType))))
    }
    val base = nm.select(col("i").as("model")).distinct()
      .join(wins, Seq("model"), "left")
      .select(col("model"), coalesce(col("wins"), lit(0L)).as("wins"))
      .localCheckpoint()
    var r = base.select(col("model"), lit(1.0).as("rating"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val denom = nm
        .join(broadcast(r.select(col("model").as("i"),
          col("rating").as("ri"))), Seq("i"))
        .join(broadcast(r.select(col("model").as("j"),
          col("rating").as("rj"))), Seq("j"))
        .withColumn("t", when(col("ri") + col("rj") > 0,
          col("n").cast("double") / (col("ri") + col("rj")))
          .otherwise(lit(0.0)))
        .groupBy(col("i").as("model"))
        .agg(aggregate(array_sort(collect_list(struct(col("j"), col("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("denom"))
      r = base.join(denom, "model")
        .select(col("model"), when(col("denom") > 0,
          col("wins").cast("double") / col("denom")).otherwise(lit(0.0))
          .as("rating"))
        .localCheckpoint()
    }
    // localCheckpoint (eager) before the unpersist, so n_matches never
    // recomputes the match scan after the cache is dropped
    val nMatches = nm.groupBy(col("i").as("model"))
      .agg(sum("n").as("n_matches")).localCheckpoint()
    nm.unpersist(false)
    base.join(nMatches, "model").join(r, "model")
      .select(col("model"), col("n_matches"), col("wins"), col("rating"))
  }

  /** SELF-CONSISTENCY majority vote (Wang et al. 2023) — the test-time
    * aggregation for sampled chain-of-thought answers, and the label
    * rule for distillation sets built from N samples: per prompt, the
    * modal ANSWER (answers normalized by case-fold + whitespace
    * collapse, so surface variants pool), its vote count, the
    * agreement rate votes/n (ONE exact division), and a `unanimous`
    * flag. Ties break to the lexicographically smallest normalized
    * answer — deterministic, and stable under resampling order. NULL
    * answers count toward n (the model failed to answer) but never win.
    * One (prompt, answer) grouped count + one per-prompt argmax —
    * partial-agged; answers move once. */
  def selfConsistency(samples: DataFrame, promptCol: String = "prompt_id",
                      answerCol: String = "answer"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(answerCol))), "\\s+", " ")
    val votes = samples.select(col(promptCol).as("p"), norm.as("a"))
      .groupBy("p", "a").agg(count(lit(1)).as("v"))
    val n = votes.groupBy("p").agg(sum("v").as("n_samples"))
    // argmax by (votes DESC, answer ASC): strings can't be negated for
    // a max-struct key, so take MIN over (−votes, answer)
    val win = votes.filter(col("a").isNotNull)
      .groupBy("p")
      .agg(min(struct((-col("v")).as("nv"), col("a").as("a"))).as("_w"))
      .select(col("p"), col("_w.a").as("majority_answer"),
        (-col("_w.nv")).as("votes"))
    n.join(win, Seq("p"), "left")
      .select(col("p").as(promptCol), col("n_samples"),
        col("majority_answer"), coalesce(col("votes"), lit(0L)).as("votes"),
        when(col("n_samples") > 0, coalesce(col("votes"), lit(0L))
          .cast("double") / col("n_samples").cast("double"))
          .as("agreement"),
        (coalesce(col("votes"), lit(0L)) === col("n_samples"))
          .cast("int").as("unanimous"))
  }

  /** VERIFIABLE-INSTRUCTION checks (the IFEval shape) — score responses
    * against per-row MACHINE-CHECKABLE constraints instead of a judge
    * model: minimum word count, required keyword, forbidden keyword,
    * required ending. One row per response with each verdict and the
    * conjunction — the instruction-following signal that filters SFT
    * responses and grades models without rubric drift. A NULL constraint
    * is vacuously satisfied (not every prompt carries every constraint);
    * a NULL response fails every ACTIVE check. Keyword matching is
    * case-folded substring containment; the ending check ignores
    * trailing whitespace. Exact integers/flags throughout — map-only,
    * nothing shuffles. */
  def instructionChecks(df: DataFrame, idCol: String = "pair_id",
                        responseCol: String = "response",
                        minWordsCol: String = "min_words",
                        keywordCol: String = "keyword",
                        forbidCol: String = "forbidden",
                        endCol: String = "must_end_with"): DataFrame = {
    val resp = col(responseCol)
    val words = size(filter(split(lower(coalesce(resp, lit(""))), " "),
      w => length(w) > 0)).cast("long")
    def gate(constraint: Column, ok: Column): Column =
      when(constraint.isNull, 1)
        .otherwise(when(resp.isNotNull && ok, 1).otherwise(0))
    df.select(col(idCol), words.as("n_words"),
        gate(col(minWordsCol), words >= col(minWordsCol)).as("words_ok"),
        gate(col(keywordCol),
          contains(lower(resp), lower(col(keywordCol)))).as("keyword_ok"),
        gate(col(forbidCol),
          !contains(lower(resp), lower(col(forbidCol)))).as("forbid_ok"),
        gate(col(endCol),
          endswith(rtrim(resp), col(endCol))).as("ending_ok"))
      .withColumn("all_pass", (col("words_ok") === 1 &&
        col("keyword_ok") === 1 && col("forbid_ok") === 1 &&
        col("ending_ok") === 1).cast("int"))
  }

  /** WIN-RATE WITH WILSON BOUNDS — the leaderboard row next to
    * [[bradleyTerry]]'s point estimate: per model, games, wins, raw win
    * rate, and the Wilson score interval (the small-sample-honest CI
    * every serious arena publishes — a 90% rate over 10 games must not
    * outrank a 70% rate over 10,000). Bit-portable with NO grid
    * machinery: counts are exact integers, z and z² are plan-time
    * literals, and the Wilson algebra is a FIXED shape of IEEE ops
    * (sqrt is correctly-rounded by the standard) replicated
    * parenthesis-for-parenthesis in the oracle. One model-keyed count
    * shuffle; the algebra is map-side on |models| rows. */
  def winRateWilson(matches: DataFrame, aCol: String = "model_a",
                    bCol: String = "model_b", winnerCol: String = "winner",
                    z: Double = 1.96): DataFrame = {
    require(z > 0, "z must be positive")
    val m = matches.filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol) &&
        (col(winnerCol) === col(aCol) || col(winnerCol) === col(bCol)))
      .select(col(aCol).as("a"), col(bCol).as("b"), col(winnerCol).as("w"))
    val games = m.select(col("a").as("model"), col("w"))
      .union(m.select(col("b").as("model"), col("w")))
      .groupBy("model")
      .agg(count(lit(1)).as("n_games"),
        sum(when(col("w") === col("model"), 1L).otherwise(0L)).as("wins"))
    winRateWilsonFromCounts(games, z)
  }

  /** The [[winRateWilson]] interval math from PRE-AGGREGATED
    * (model, n_games, wins) integers — the incremental-arena entry
    * point: game/win totals are additive across micro-batches, and the
    * interval is a pure function of the accumulated integers (every
    * division happens here, once), so fold-then-fit equals
    * fit-over-union bit for bit. */
  def winRateWilsonFromCounts(games: DataFrame,
                              z: Double = 1.96): DataFrame = {
    require(z > 0, "z must be positive")
    val n = col("n_games").cast("double")
    val p = col("wins").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (n * 2.0)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (n * n * 4.0))) / denom
    games.select(col("model"), col("n_games"), col("wins"),
      p.as("win_rate"), (center - half).as("wilson_lo"),
      (center + half).as("wilson_hi"))
  }

  /** PASS@K estimator (Chen et al. 2021, the HumanEval metric) — for
    * generated-sample corpora with a per-sample pass verdict: per
    * prompt, n samples, c passes, and the unbiased
    * pass@k = 1 − C(n−c,k)/C(n,k), computed in the numerically-stable
    * product form Π_{i<k} (n−c−i)/(n−i) — each factor ONE exact-integer
    * division, folded in fixed i order, so the estimate is bit-portable
    * with no grid. Prompts with n < k report NULL for that k (the
    * estimator needs k samples); a zero factor (c > n−k) collapses the
    * product to 0 → pass@k = 1 exactly. One grouped count per prompt;
    * the fold is a k-step in-row expression — map-side, no shuffle past
    * the count. */
  def passAtK(samples: DataFrame, ks: Seq[Int] = Seq(1, 5),
              promptCol: String = "prompt_id",
              passCol: String = "passed"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val base = samples.filter(col(passCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(passCol).cast("int") === 1, 1L)
          .otherwise(0L)).as("c"))
    ks.foldLeft(base) { (df, k) =>
      val prod = aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
        (acc, i) => acc * ((col("n") - col("c") - i).cast("double") /
          (col("n") - i).cast("double")))
      df.withColumn(s"pass_at_$k",
        when(col("n") >= k, lit(1.0) - prod))
    }
  }

  /** ARENA LEADERBOARD — the published table: [[bradleyTerry]]'s
    * strength fit joined with [[winRateWilson]]'s honest intervals, one
    * row per model ranked by rating (ties to model name). Note the two
    * denominators differ by design: `n_matches` counts every valid
    * a≠b comparison (all of them shape the MM fit), `n_games` only
    * DECIDED ones (winner ∈ {a, b}) — a gap between the two is the
    * corpus's invalid-verdict rate. The rank window runs over |models|
    * rows (the rrfFuse bounded-window convention). */
  def arenaLeaderboard(matches: DataFrame, iterations: Int = 2,
                       z: Double = 1.96): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("rating").desc, col("model"))
    bradleyTerry(matches, iterations = iterations)
      .join(winRateWilson(matches, z = z)
        .select(col("model"), col("n_games"), col("win_rate"),
          col("wilson_lo"), col("wilson_hi")), "model")
      .withColumn("arena_rank", row_number().over(w))
  }

  /** [[arenaLeaderboard]] from STORED sufficient statistics — the
    * incremental-arena finisher: `pairCounts` (i, j, n) + `btWins`
    * (model, wins) feed [[bradleyTerryFromCounts]], `games`
    * (model, n_games, wins — DECIDED games only) feeds
    * [[winRateWilsonFromCounts]]; same join, same rank window. All
    * three statistics are additive integers, so a leaderboard refit
    * from accumulated state equals the batch [[arenaLeaderboard]] over
    * the unioned matches bit for bit (StreamingSpec pins it). */
  def arenaLeaderboardFromState(pairCounts: DataFrame, btWins: DataFrame,
                                games: DataFrame, iterations: Int = 2,
                                z: Double = 1.96): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("rating").desc, col("model"))
    bradleyTerryFromCounts(pairCounts, btWins, iterations)
      .join(winRateWilsonFromCounts(games, z)
        .select(col("model"), col("n_games"), col("win_rate"),
          col("wilson_lo"), col("wilson_hi")), "model")
      .withColumn("arena_rank", row_number().over(w))
  }

  /** LENGTH-BIAS audit over preference pairs — the classic reward-model
    * failure (verbosity bias: "longer sounds better"): if the chosen
    * response out-lengths the rejected one far above chance, DPO/RLHF
    * training on these pairs optimizes for length, not quality — the
    * motivation behind length-controlled evaluation. One corpus-level
    * row: pair count, sign-test counts (chosen longer / rejected longer
    * / ties, exact integers on whitespace-token lengths), the mean
    * length delta (ONE division of exact sums), and a `length_biased`
    * flag raised by integer cross-multiplication when chosen_longer
    * exceeds biasNum/biasDen of all pairs (default 13/20 = 65%) — no
    * float decides the flag.
    *
    * Scale shape: map-only token counts per pair, one global
    * conditional-sum aggregation (map-side combined). Pairs with a NULL
    * side are excluded — there is nothing to compare. */
  def lengthBiasAudit(pairs: DataFrame, chosenCol: String = "chosen",
                      rejectedCol: String = "rejected",
                      biasNum: Long = 13, biasDen: Long = 20): DataFrame = {
    require(biasNum > 0 && biasDen > 0, "bias threshold must be positive")
    def tokLen(c: Column): Column =
      size(filter(split(lower(c), " "), w => length(w) > 0)).cast("long")
    pairs
      .filter(col(chosenCol).isNotNull && col(rejectedCol).isNotNull)
      .select(tokLen(col(chosenCol)).as("lc"),
        tokLen(col(rejectedCol)).as("lr"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("lc") > col("lr"), 1L).otherwise(0L))
          .as("chosen_longer"),
        sum(when(col("lr") > col("lc"), 1L).otherwise(0L))
          .as("rejected_longer"),
        sum(when(col("lc") === col("lr"), 1L).otherwise(0L))
          .as("len_ties"),
        sum(col("lc") - col("lr")).as("_ds"))
      .select(col("n_pairs"), col("chosen_longer"), col("rejected_longer"),
        col("len_ties"),
        (col("_ds").cast("double") / col("n_pairs").cast("double"))
          .as("mean_len_delta"),
        when(col("chosen_longer") * biasDen > col("n_pairs") * biasNum, 1)
          .otherwise(0).as("length_biased"))
  }

  /** BOOTSTRAP confidence interval for per-model eval accuracy — the
    * honesty layer benchmark deltas need (is 71.2 vs 70.8 signal or
    * resampling noise?), fully DETERMINISTIC so the estimate is
    * reproducible and oracle-checkable: resample `b` pseudo-datasets of
    * n items with replacement, where draw i of resample r picks item
    * index md5(model:r:i) mod n (the hashBucket idiom — portable,
    * seedless, stable across engines and runs), score each resample
    * with ONE exact division, and report the percentile interval as
    * ORDER STATISTICS of the b resample accuracies (ranks
    * ceil(lo·b)/ceil(hi·b) — no interpolation, so every reported value
    * is an exact k/n quotient). NULL verdicts are excluded before
    * anything is drawn.
    *
    * Output: (model, n_items, accuracy, boot_lo, boot_hi, n_resamples).
    *
    * Scale shape: the fan-out is |models|·b·n draw rows — the
    * estimator's definition, over EVAL-sized n (thousands), never
    * corpus-sized; draws join items on (model, rank) — partial-agged
    * per (model, resample) down to |models|·b rows, then one
    * b-bounded collect_list per model (bounded by the b CONSTANT, the
    * Bloom-bitset rule). The per-model rank window orders eval items
    * once. */
  def bootstrapEvalCI(results: DataFrame, b: Int = 200,
                      itemCol: String = "item_id",
                      modelCol: String = "model",
                      passCol: String = "passed",
                      lo: Double = 0.025, hi: Double = 0.975): DataFrame = {
    require(b >= 2, "need at least two resamples")
    require(lo > 0 && hi < 1 && lo < hi, "percentiles out of range")
    import org.apache.spark.sql.expressions.Window
    val loR = math.max(1, math.ceil(lo * b).toInt)
    val hiR = math.min(b, math.ceil(hi * b).toInt)
    val items = results.filter(col(passCol).isNotNull)
      .select(col(modelCol).as("model"), col(itemCol).as("item"),
        col(passCol).cast("long").as("p"))
    val w = Window.partitionBy("model").orderBy("item")
    val it = items.withColumn("rn",
      (row_number().over(w) - 1).cast("long"))
    val per = it.groupBy("model")
      .agg(count(lit(1)).as("n"), sum("p").as("wins"))
    // draw rows: resample r in [0, b), draw i in [0, n) — two chained
    // explodes (b-sized then n-sized arrays) generate the identical
    // (model, r, i) set the old single k-explode did without ever
    // materializing one n·b-element array per model row; the drawn
    // index is the portable md5 bucket of (model, r, i)
    val draws = per.select(col("model"), col("n"),
        explode(sequence(lit(0L), lit((b - 1).toLong))).as("r"))
      .select(col("model"), col("n"), col("r"),
        explode(sequence(lit(0L), col("n") - 1)).as("i"))
      .withColumn("rn", pmod(
        graft.functions.HashExpressions.md5Prefix(
          concat(col("model"), lit(":"), col("r"),
            lit(":"), col("i")), 8),
        col("n")))
    // the items side is EVAL-sized by contract (|models|·n rows,
    // thousands) — broadcast it so the b·n draw fan-out never
    // sort-merge-shuffles; draws partial-agg per (model, resample)
    val resamples = draws.join(broadcast(it), Seq("model", "rn"))
      .groupBy("model", "r")
      .agg((sum("p").cast("double") / count(lit(1))).as("acc"))
    val ci = resamples.groupBy("model")
      .agg(array_sort(collect_list(col("acc"))).as("accs"))
      .select(col("model"),
        element_at(col("accs"), loR).as("boot_lo"),
        element_at(col("accs"), hiR).as("boot_hi"))
    per.join(ci, "model")
      .select(col("model"), col("n").as("n_items"),
        (col("wins").cast("double") / col("n")).as("accuracy"),
        col("boot_lo"), col("boot_hi"),
        lit(b).cast("long").as("n_resamples"))
  }

  /** PAIRED bootstrap for a model-vs-model accuracy DELTA — the
    * significance test behind every "A beats B by 0.4" claim: both
    * models score the SAME resampled item set (pairing removes the
    * item-difficulty variance an unpaired interval wastes power on),
    * draw i of resample r picking item md5(modelA|modelB:r:i) mod n
    * over the SHARED item domain (inner join of both models' non-null
    * verdicts). Per resample, the delta is ONE exact division of the
    * integer win-difference sum; the CI is the order-statistic
    * percentile of the b deltas ([[bootstrapEvalCI]]'s convention) and
    * `significant` = the interval excludes zero. Deterministic and
    * engine-portable end to end.
    *
    * One output row. The global rank window orders the shared item set
    * once — eval-sized by contract, like the broadcast item join. */
  def bootstrapPairedDelta(results: DataFrame, modelA: String,
                           modelB: String, b: Int = 200,
                           itemCol: String = "item_id",
                           modelCol: String = "model",
                           passCol: String = "passed",
                           lo: Double = 0.025,
                           hi: Double = 0.975): DataFrame = {
    require(b >= 2, "need at least two resamples")
    require(lo > 0 && hi < 1 && lo < hi, "percentiles out of range")
    import org.apache.spark.sql.expressions.Window
    val loR = math.max(1, math.ceil(lo * b).toInt)
    val hiR = math.min(b, math.ceil(hi * b).toInt)
    def side(m: String, as: String) =
      results.filter(col(modelCol) === m && col(passCol).isNotNull)
        .select(col(itemCol).as("item"), col(passCol).cast("long").as(as))
    val it = side(modelA, "pa").join(side(modelB, "pb"), "item")
      .withColumn("rn",
        (row_number().over(Window.orderBy("item")) - 1).cast("long"))
    val per = it.agg(count(lit(1)).as("n"), sum("pa").as("wa"),
      sum("pb").as("wb"))
    val key = s"$modelA|$modelB"
    // same two-level explode as [[bootstrapEvalCI]] — identical
    // (r, i) set, no n·b-element array per row
    val draws = per.select(col("n"),
        explode(sequence(lit(0L), lit((b - 1).toLong))).as("r"))
      .select(col("n"), col("r"),
        explode(sequence(lit(0L), col("n") - 1)).as("i"))
      .withColumn("rn", pmod(
        graft.functions.HashExpressions.md5Prefix(
          concat(lit(key), lit(":"), col("r"),
            lit(":"), col("i")), 8),
        col("n")))
    val resamples = draws.join(broadcast(it), Seq("rn"))
      .groupBy("r")
      .agg((sum(col("pa") - col("pb")).cast("double") / count(lit(1)))
        .as("d"))
    val ci = resamples
      .agg(array_sort(collect_list(col("d"))).as("ds"))
      .select(element_at(col("ds"), loR).as("boot_lo"),
        element_at(col("ds"), hiR).as("boot_hi"))
    per.crossJoin(ci)
      .select(lit(modelA).as("model_a"), lit(modelB).as("model_b"),
        col("n").as("n_items"),
        ((col("wa") - col("wb")).cast("double") / col("n")).as("delta"),
        col("boot_lo"), col("boot_hi"),
        (col("boot_lo") > 0 || col("boot_hi") < 0).cast("int")
          .as("significant"),
        lit(b).cast("long").as("n_resamples"))
  }

  /** CALIBRATION REPORT — the reliability-diagram table behind every
    * "is the judge/classifier confidence trustworthy" decision (Guo et
    * al. 2017 temperature-scaling diagnostics): equal-width confidence
    * bins, per bin the count, accuracy, mean confidence, and the
    * |accuracy − confidence| gap. Bin = floor(conf·bins) with conf=1.0
    * clamped into the last bin (the standard convention); NULL
    * confidences or verdicts are excluded and reported via the count
    * column's complement at the caller.
    *
    * Float discipline: accuracy is ONE exact-integer division; mean
    * confidence is Σconf/n — portable when confidences live on a
    * DYADIC grid (k/2^m is exactly representable, so partial sums are
    * exact and order-independent; real pipelines emit model logprobs,
    * snap them to the 2^-20 grid first — the q242 ln convention); the
    * gap is one correctly-rounded subtraction of the two. Scale: one
    * partial-agged |bins|-row aggregation; rows never shuffle twice. */
  def calibrationReport(results: DataFrame,
                        confCol: String = "confidence",
                        correctCol: String = "correct",
                        bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least two bins")
    results
      .filter(col(confCol).isNotNull && col(correctCol).isNotNull &&
        col(confCol) >= 0 && col(confCol) <= 1)
      .select(least(floor(col(confCol) * bins), lit(bins - 1))
          .cast("int").as("bin"),
        col(confCol).cast("double").as("conf"),
        col(correctCol).cast("long").as("c"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("c").as("n_correct"),
        (sum("c").cast("double") / count(lit(1))).as("accuracy"),
        (sum("conf") / count(lit(1))).as("mean_confidence"))
      .withColumn("gap", abs(col("accuracy") - col("mean_confidence")))
  }

  /** BRIER SCORE — the proper scoring rule next to
    * [[calibrationReport]]'s reliability view: mean (confidence −
    * outcome)², strictly proper (unlike ECE it cannot be gamed by
    * binning) and the standard judge-quality scalar. Confidences must
    * sit on a 1/gridDen grid (the house bit-portability recipe —
    * model probabilities snap upstream): the score then reduces to
    * INTEGER sufficient statistics, Σ(k − gridDen·y)², one exact
    * map-side-combined sum + ONE division — bit-identical across
    * engines and partitionings. One row out. */
  def brierScore(results: DataFrame, gridDen: Int = 128,
                 confCol: String = "confidence",
                 correctCol: String = "correct"): DataFrame = {
    require(gridDen >= 1, s"gridDen must be positive, got $gridDen")
    val k = round(col(confCol) * gridDen).cast("long")
    val d = k - col(correctCol).cast("long") * gridDen
    results
      .filter(col(confCol).isNotNull && col(correctCol).isNotNull &&
        col(confCol) >= 0 && col(confCol) <= 1)
      .select(d.as("d"))
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sq_sum"))
      .withColumn("brier", col("sq_sum").cast("double") /
        (col("n") * lit(gridDen.toLong) * lit(gridDen.toLong))
          .cast("double"))
  }

  /** EXPECTED CALIBRATION ERROR from a [[calibrationReport]]: the
    * n-weighted mean gap, ECE = Σ_b (n_b/N)·|acc_b − conf̄_b|. The
    * cross-bin float sum is ORDER-DEPENDENT in general, so both the
    * weighted terms and their reduction run as a FIXED-ORDER
    * sequential fold over the bin-sorted list (the q221 portable-sum
    * convention) — bit-identical across engines and partitionings.
    * |bins| rows in, one row out. */
  def expectedCalibrationError(report: DataFrame): DataFrame =
    report
      .select(col("bin"), col("n"),
        (col("gap") * col("n").cast("double")).as("w"))
      .agg(sum("n").as("n_total"), count(lit(1)).as("n_bins"),
        aggregate(
          array_sort(collect_list(struct(col("bin"), col("w")))),
          lit(0.0), (acc, x) => acc + x.getField("w")).as("wsum"))
      .select(col("n_bins"), col("n_total"),
        (col("wsum") / col("n_total").cast("double")).as("ece"))
}
