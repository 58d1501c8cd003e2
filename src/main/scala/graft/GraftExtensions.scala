package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions.{DotProduct, MinHashSignature, SimHash64, WordShingles}

/** SQL surface for the engine's custom expressions.
  *
  * Install at session build time:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  * }}}
  * or at runtime on an existing session via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions._
  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, className, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
    tableBuilders.foreach { case (name, className, builder) =>
      e.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
  }
}

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, catalystExpression}

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private def doubleLit(e: Expression, fn: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    // plain SQL decimals like 0.12 parse as DecimalType literals
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal numeric argument, got $other")
  }

  private def arity(fn: String, exprs: Seq[Expression],
                    min: Int, max: Int): Unit =
    if (exprs.size < min || exprs.size > max)
      throw new IllegalArgumentException(
        s"$fn expects ${if (min == max) s"$min" else s"$min to $max"} " +
          s"argument(s), got ${exprs.size}")

  private[graft] val builders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", classOf[DotProduct].getName,
      exprs => { arity("dot_product", exprs, 2, 2)
        DotProduct(exprs(0), exprs(1)) }),
    ("word_shingles", classOf[WordShingles].getName,
      exprs => { arity("word_shingles", exprs, 2, 2)
        WordShingles(exprs(0), intLit(exprs(1), "word_shingles")) }),
    ("minhash_sig", classOf[MinHashSignature].getName,
      exprs => { arity("minhash_sig", exprs, 2, 2)
        MinHashSignature(exprs(0), intLit(exprs(1), "minhash_sig")) }),
    ("simhash64", classOf[SimHash64].getName,
      exprs => { arity("simhash64", exprs, 1, 1)
        SimHash64(exprs(0)) }),
    ("token_entropy", classOf[graft.functions.TokenEntropy].getName,
      exprs => { arity("token_entropy", exprs, 1, 1)
        graft.functions.TokenEntropy(exprs(0)) }),
    ("jaro_winkler", classOf[graft.functions.JaroWinkler].getName,
      exprs => { arity("jaro_winkler", exprs, 2, 2)
        graft.functions.JaroWinkler(exprs(0), exprs(1)) }),
    // composed text-curation functions: builders expand to the same
    // Column compositions the Scala API uses (one source of truth).
    // Optional trailing arguments mirror the Scala defaults.
    ("quality_score", graft.text.TextOps.getClass.getName,
      exprs => { arity("quality_score", exprs, 1, 1)
        catalystExpression(graft.text.TextOps.qualityScore(column(exprs(0)))) }),
    // absent optional args call the Scala overload with its own default —
    // never a copied constant, so the two surfaces cannot diverge
    ("lang_id_en", graft.text.TextOps.getClass.getName,
      exprs => { arity("lang_id_en", exprs, 1, 2)
        catalystExpression(
          if (exprs.size > 1)
            graft.text.TextOps.langIdEn(column(exprs(0)),
              doubleLit(exprs(1), "lang_id_en"))
          else graft.text.TextOps.langIdEn(column(exprs(0)))) }),
    ("hash_split", graft.text.TextOps.getClass.getName,
      exprs => { arity("hash_split", exprs, 1, 3)
        catalystExpression(exprs match {
          case Seq(k) => graft.text.TextOps.hashSplit(column(k))
          case Seq(k, tr) => graft.text.TextOps.hashSplit(column(k),
            intLit(tr, "hash_split"))
          case Seq(k, tr, vp) => graft.text.TextOps.hashSplit(column(k),
            intLit(tr, "hash_split"), intLit(vp, "hash_split"))
        }) }),
    ("dup_ngram_fraction", graft.text.TextOps.getClass.getName,
      exprs => { arity("dup_ngram_fraction", exprs, 1, 2)
        catalystExpression(
          if (exprs.size > 1)
            graft.text.TextOps.duplicateNgramFraction(column(exprs(0)),
              intLit(exprs(1), "dup_ngram_fraction"))
          else graft.text.TextOps.duplicateNgramFraction(column(exprs(0)))) }),
    ("frequent_items", classOf[graft.functions.FrequentItemsAggregate].getName,
      exprs => { arity("frequent_items", exprs, 1, 2)
        graft.functions.FrequentItemsAggregate(exprs(0),
          if (exprs.size > 1) intLit(exprs(1), "frequent_items") else 1024)
          .toAggregateExpression() }),
    ("deflate_ratio", classOf[graft.functions.DeflateRatio].getName,
      exprs => { arity("deflate_ratio", exprs, 1, 1)
        graft.functions.DeflateRatio(exprs(0)) }),
    ("normalize_url", graft.text.UrlOps.getClass.getName,
      exprs => { arity("normalize_url", exprs, 1, 2)
        catalystExpression(
          if (exprs.size > 1)
            graft.text.UrlOps.normalizeUrl(column(exprs(0)),
              strLit(exprs(1), "normalize_url"))
          else graft.text.UrlOps.normalizeUrl(column(exprs(0)))) }),
    // registered_domain(host) = the two-level-ccTLD heuristic;
    // registered_domain(host, 'psl') = the shipped PSL excerpt;
    // registered_domain(host, '<r1>,<r2>,...') = a custom rule list
    ("registered_domain", graft.text.UrlOps.getClass.getName,
      exprs => { arity("registered_domain", exprs, 1, 2)
        catalystExpression(exprs match {
          case Seq(h) => graft.text.UrlOps.registeredDomain(column(h))
          case Seq(h, r) =>
            val arg = strLit(r, "registered_domain")
            val rules = if (arg == "psl") graft.text.UrlOps.PslSuffixes
              else arg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            graft.text.UrlOps.registeredDomain(column(h), rules)
        }) }),
    ("html_extract", graft.text.TextOps.getClass.getName,
      exprs => { arity("html_extract", exprs, 1, 1)
        catalystExpression(
          graft.text.TextOps.htmlExtract(column(exprs(0)))) }),
    ("detect_license", graft.text.TextOps.getClass.getName,
      exprs => { arity("detect_license", exprs, 1, 1)
        catalystExpression(
          graft.text.TextOps.detectLicense(column(exprs(0)))) }),
    // blocklist_fraction(text, 'w1,w2,...') — the comma-separated literal
    // list form the other rule-set surfaces use
    ("blocklist_fraction", graft.text.TextOps.getClass.getName,
      exprs => { arity("blocklist_fraction", exprs, 2, 2)
        catalystExpression(
          graft.text.TextOps.blocklistFraction(column(exprs(0)),
            strLit(exprs(1), "blocklist_fraction").split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq)) }),
    ("normalize_text", graft.text.TextOps.getClass.getName,
      exprs => { arity("normalize_text", exprs, 1, 1)
        catalystExpression(
          graft.text.TextOps.normalizeText(column(exprs(0)))) }),
    // bpe_encode(word, 'a b,th e,...') — merges as the comma-separated
    // 'left right' pair list the trainer (q152 shape) emits
    ("bpe_encode", graft.text.TextOps.getClass.getName,
      exprs => { arity("bpe_encode", exprs, 2, 2)
        val merges = strLit(exprs(1), "bpe_encode").split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq.map { m =>
            val parts = m.split(" ", 2)
            require(parts.length == 2,
              s"bpe_encode: merge '$m' is not 'left right'")
            (parts(0), parts(1))
          }
        catalystExpression(
          graft.text.TextOps.bpeEncodeWord(column(exprs(0)), merges)) }),
    ("luhn_valid", graft.text.TextOps.getClass.getName,
      exprs => { arity("luhn_valid", exprs, 1, 1)
        catalystExpression(
          graft.text.TextOps.luhnValid(column(exprs(0)))) }),
    ("render_chat", graft.ops.Chat.getClass.getName,
      exprs => { arity("render_chat", exprs, 1, 1)
        catalystExpression(
          graft.ops.Chat.renderTemplate(column(exprs(0)))) }),
    // fim_text(id, text [, rate_pct]) — the FIM PSM rebuild for gated
    // rows, pass-through otherwise (q226's per-row core)
    ("fim_text", graft.text.TextOps.getClass.getName,
      exprs => { arity("fim_text", exprs, 2, 3)
        val rate = if (exprs.size > 2) intLit(exprs(2), "fim_text")
          else 50
        catalystExpression(graft.text.TextOps.fimText(
          column(exprs(0)), column(exprs(1)), rate)) }),
    // round-14 surface: Unicode normalization (form defaults to NFC),
    // the BLEU statistics kernel, and the 2-dim Morton layout key.
    // WordPiece stays Scala-only — its vocab rides a broadcast handle
    // a SQL literal cannot carry.
    ("unicode_normalize",
      classOf[graft.functions.UnicodeNormalize].getName,
      exprs => { arity("unicode_normalize", exprs, 1, 2)
        val form = if (exprs.size > 1) strLit(exprs(1),
          "unicode_normalize") else "NFC"
        new graft.functions.UnicodeNormalize(exprs(0), form) }),
    ("bleu_stats", classOf[graft.functions.BleuStats].getName,
      exprs => { arity("bleu_stats", exprs, 2, 3)
        val maxN = if (exprs.size > 2) intLit(exprs(2), "bleu_stats")
          else 4
        graft.functions.BleuStats(exprs(0), exprs(1), maxN) }),
    ("morton_key", graft.ops.Layout.getClass.getName,
      exprs => { arity("morton_key", exprs, 2, 3)
        val bits = if (exprs.size > 2) intLit(exprs(2), "morton_key")
          else 16
        catalystExpression(graft.ops.Layout.mortonKey(
          Seq(column(exprs(0)), column(exprs(1))), bits)) }),
    ("html_meta", graft.text.TextOps.getClass.getName,
      exprs => { arity("html_meta", exprs, 1, 1)
        catalystExpression(
          graft.text.TextOps.htmlMeta(column(exprs(0)))) }),
    // round-15 surface: the sitemap XML entity decode and the packed
    // sign-bit Hamming distance
    ("xml_unescape", classOf[graft.functions.XmlUnescape].getName,
      exprs => { arity("xml_unescape", exprs, 1, 1)
        graft.functions.XmlUnescape(exprs(0)) }),
    ("fix_mojibake", classOf[graft.functions.FixMojibake].getName,
      exprs => { arity("fix_mojibake", exprs, 1, 1)
        new graft.functions.FixMojibake(exprs(0)) }),
    ("hamming_dist", graft.ml.Similarity.getClass.getName,
      exprs => { arity("hamming_dist", exprs, 2, 2)
        catalystExpression(graft.ml.Similarity.hammingDist(
          column(exprs(0)), column(exprs(1)))) }))

  // ---- table functions: whole-operator SQL surface ----------------------
  // The interval-algebra signature operators are DataFrame→DataFrame
  // transforms; a SQL-only user reaches them as table-valued functions
  // taking view/table NAMES as string literals (the classic TVF argument
  // form — polymorphic TABLE(...) args are a parser feature these
  // builders don't need):
  //   SELECT * FROM graft_merge_intervals('iv_view', 'user_id')
  //   SELECT * FROM graft_subtract_intervals('base_v', 'sub_v', 'user_id')
  //   SELECT * FROM graft_intersect_intervals('base_v', 'sub_v', 'user_id')
  //   SELECT * FROM graft_interval_coverage('iv_view', 'user_id')
  // Views follow the engine's interval convention (partition keys...,
  // start_time, end_time); the trailing keys argument is a
  // comma-separated list, omitted for un-keyed (global) algebra. Each
  // builder expands to the SAME Column-API composition the Scala surface
  // uses (one source of truth), so the two surfaces cannot diverge.

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal STRING argument, got $other")
  }

  private def keysArg(exprs: Seq[Expression], idx: Int,
                      fn: String): Seq[String] =
    if (exprs.size > idx)
      strLit(exprs(idx), fn).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
    else Nil

  private def viewDf(name: String) = SparkSession.active.table(name)

  private[graft] val tableBuilders: Seq[(String, String,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_merge_intervals", graft.ops.Windows.getClass.getName,
      exprs => { arity("graft_merge_intervals", exprs, 1, 2)
        graft.ops.Windows.mergeIntervals(
          viewDf(strLit(exprs(0), "graft_merge_intervals")),
          keysArg(exprs, 1, "graft_merge_intervals"))
          .queryExecution.logical }),
    ("graft_subtract_intervals", graft.ops.Intervals.getClass.getName,
      exprs => { arity("graft_subtract_intervals", exprs, 2, 3)
        graft.ops.Intervals.subtractIntervals(
          viewDf(strLit(exprs(0), "graft_subtract_intervals")),
          viewDf(strLit(exprs(1), "graft_subtract_intervals")),
          keysArg(exprs, 2, "graft_subtract_intervals"))
          .queryExecution.logical }),
    ("graft_intersect_intervals", graft.ops.Intervals.getClass.getName,
      exprs => { arity("graft_intersect_intervals", exprs, 2, 3)
        graft.ops.Intervals.intersectIntervals(
          viewDf(strLit(exprs(0), "graft_intersect_intervals")),
          viewDf(strLit(exprs(1), "graft_intersect_intervals")),
          keysArg(exprs, 2, "graft_intersect_intervals"))
          .queryExecution.logical }),
    ("graft_interval_coverage", graft.ops.Aggregators.getClass.getName,
      exprs => { arity("graft_interval_coverage", exprs, 1, 2)
        import org.apache.spark.sql.functions.{col, unix_micros}
        val df = viewDf(strLit(exprs(0), "graft_interval_coverage"))
        val keys = keysArg(exprs, 1, "graft_interval_coverage")
        val cov = graft.ops.Aggregators.intervalCoverageUs(
          unix_micros(col("start_time")), unix_micros(col("end_time")))
          .as("covered_us")
        (if (keys.isEmpty) df.agg(cov)
         else df.groupBy(keys.map(col): _*).agg(cov))
          .queryExecution.logical }))

  /** Runtime registration (temp functions) for an existing session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    tableBuilders.foreach { case (name, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
  }
}
