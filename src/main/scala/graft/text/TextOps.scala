package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data curation (engine
  * extension — no reference analogue; the reference's string work stops at
  * regex extraction, SURVEY.md §2.2 P18-P19).
  *
  * All pure column expressions → whole-stage codegen, no UDFs; every
  * operator is embarrassingly parallel over documents (no shuffle).
  */
object TextOps {

  /** Top English function words for the n-gram/stopword language heuristic
    * and quality ratios. */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "by",
    "from", "this", "be", "are", "was", "not", "but", "have", "has")

  /** Whitespace tokenization. `split` on single spaces matches the oracle's
    * `string_split(text, ' ')` exactly (empty tokens preserved). */
  def wsTokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword count: words + digits + punctuation runs — a regex
    * proxy for tokenizer load (one token per word-piece of ≤4 chars). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"),
      lit(0)))

  /** Fraction of whitespace tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val stops = filter(toks, t => t.isin(EnStopwords: _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) -
        length(regexp_replace(text, "[^A-Za-z0-9\\s]", "")))
        .cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
      .otherwise(lit(0.0))
  }

  /** Language-ID heuristic: stopword hit-rate over function words. Returns
    * "en" above `threshold`, else "other". (A real model would use char
    * n-gram profiles; the stopword rate is the standard cheap first pass.) */
  def langIdEn(text: Column, threshold: Double = 0.12): Column =
    when(stopwordRatio(text) >= threshold, "en").otherwise("other")

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation noise. Deterministic, codegen'd, tunable weights. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5, lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2))
  }

  /** Document fingerprint: stable 64-bit content hash (xxhash64) plus a
    * normalized-content variant (case/whitespace folded) for near-exact
    * dedup. */
  def fingerprint(text: Column): Column = xxhash64(text)

  /** PII scrubbing: apply (pattern → replacement) rules in order. Patterns
    * must stay in the Java-regex ∩ RE2 common subset (no backreferences /
    * lookaround) so results are portable across engines — the correctness
    * harness cross-checks them in DuckDB. */
  def scrubPii(text: Column,
               rules: Seq[(String, String)] = DefaultPiiRules): Column =
    rules.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Email + phone-suffix + 16-digit-card defaults; replace-all. */
  val DefaultPiiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9.+_-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\d{3}-\\d{4}" -> "<PHONE>",
    "\\d{16}" -> "<CARD>")

  /** Deterministic hash bucket in [0, buckets): first 8 hex digits of
    * md5(key) mod buckets. Portable (md5-only) on purpose: the same
    * expression works in any SQL engine, so train/val/test membership is
    * stable across the whole data platform, not just this engine. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Deterministic train/val/test split label from [[hashBucket]]:
    * [0,trainPct) → train, [trainPct,trainPct+valPct) → val, rest test. */
  def hashSplit(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Content-defined rolling-hash fingerprints: hash every character
    * k-gram, keep the content-defined sample (hash prefix '0' → 1/16 rate).
    * The winnowing-style selection is position-independent, so shared
    * passages produce shared fingerprints regardless of offset — the
    * standard near-dup/plagiarism fingerprint. Returns the sampled hash
    * array (empty → whole-text hash). */
  def rollingFingerprints(text: Column, k: Int = 16): Column =
    graft.functions.VectorExpressions.rollingFingerprints(text, k)

  /** Word n-gram shingles (lowercased, distinct, first-occurrence order),
    * for Jaccard/MinHash dedup. Native single-pass kernel
    * ([[graft.functions.WordShingles]]) — semantically identical to the
    * `array_distinct(transform(sequence…))` composition but without its
    * per-query codegen cost or per-position re-slicing. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.VectorExpressions.wordShingles(text, n)

  /** Gopher-style within-document repetition signal: fraction of word
    * n-grams that are duplicates of an earlier n-gram in the same document
    * (1 − distinct/total). 0.0 for null/short texts. Pure per-row column
    * expression — map-only, no shuffle at any scale. */
  def duplicateNgramFraction(text: Column, n: Int = 2): Column = {
    val total = size(split(lower(text), " ")) - (n - 1)
    // distinct n-gram count via the native single-pass WordShingles kernel
    // (the guard keeps its whole-text fallback branch unreachable); the
    // equivalent transform(sequence…)+array_distinct lambda tree costs
    // seconds of fixed codegen per query and re-slices per position
    when(text.isNull.or(total < 1), lit(0.0))
      .otherwise(lit(1.0) -
        size(shingles(text, n)).cast("double") / total.cast("double"))
  }

  /** TF-IDF top-k terms per document (whitespace terms, lowercased;
    * sklearn-style smoothed idf = ln((1+N)/(1+df)) + 1).
    *
    * Shuffle ledger at 100 TB: one (doc, term) partial-agg shuffle for tf,
    * one term-keyed shuffle for df (counts only — hot terms are a single
    * long per partition thanks to map-side combine), the corpus size N is
    * a 1-row broadcast, and the final top-k window repartitions by doc.
    * In production prune stopwords/min-df first — they dominate df volume
    * and never reach any top-k. */
  def tfidfTopTerms(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", k: Int = 3): DataFrame = {
    val present = docs.filter(col(textCol).isNotNull)
    val tf = present
      .select(col(idCol).as(idCol),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = present.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") *
        (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rk"))
  }

  /** Benchmark decontamination: drop training documents that share any
    * word `n`-gram with the evaluation set (the standard guard against
    * test-set leakage into LLM training data).
    *
    * Eval shingles are deduped before the semi-join; at 100 TB the eval
    * side is tiny (benchmarks, not corpora), so Catalyst broadcasts it and
    * the train corpus is filtered map-side — the full text never shuffles,
    * only (id, shingle) pairs for the semi-join probe. Null-text training
    * rows produce no shingles and are trivially clean. */
  def decontaminate(train: DataFrame, evalSet: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 8): DataFrame = {
    val trainSh = train.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("shingle"))
    val evalSh = evalSet
      .select(explode(shingles(col(textCol), n)).as("shingle"))
      .distinct()
    val contaminated = trainSh.join(evalSh, Seq("shingle"), "left_semi")
      .select(col("id")).distinct()
    train.join(contaminated, train(idCol) === contaminated("id"),
      "left_anti")
  }

  /** Full per-document profile. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("mean_token_len", meanTokenLen(t))
      .withColumn("lang_pred", langIdEn(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
