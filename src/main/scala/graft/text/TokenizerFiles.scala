package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the two merge-table formats tokenizers actually ship in,
  * feeding [[graft.functions.BpeEncodeWord]]'s broadcast kernel: the
  * GPT-2 `merges.txt` line format and the HuggingFace fast-tokenizer
  * `tokenizer.json` (`model.merges`, plus the `model.vocab` id map).
  *
  * A tokenizer file is an operator CONSTANT — ~50k lines / a few MB of
  * configuration, not corpus data — so both readers parse DRIVER-SIDE
  * through the Hadoop FileSystem API (local, HDFS, or object-store
  * paths all resolve) and the table ships to executors exactly once via
  * [[TextOps.bpeMergesBroadcast]]. Rank is LINE/ARRAY ORDER, which a
  * distributed text scan cannot guarantee and the driver read preserves
  * by construction.
  *
  * Reference corpus for the encode semantics: the q154/q269 merge fold
  * (Sennrich BPE — greedy left-to-right pass per merge, rank order). */
object TokenizerFiles {

  private def openLines(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.getLines().toVector finally src.close()
    } finally in.close()
  }

  /** Parse a GPT-2-style `merges.txt`: optional `#version` header,
    * blank lines ignored, then ONE MERGE PER LINE as two space-separated
    * symbols whose rank is the line order (the format every BPE
    * tokenizer distribution uses — GPT-2, RoBERTa, CLIP). Symbols are
    * byte-level printable forms (e.g. `Ġ` for a leading space) and pass
    * through verbatim — this reader does not re-map the byte alphabet.
    * Trailing `\r` (a CRLF-saved file) is stripped; a line that is not
    * exactly two fields fails with its line number. */
  def readMergesTxt(spark: SparkSession, path: String)
      : Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var lineNo = 0
    openLines(spark, path).foreach { raw =>
      lineNo += 1
      val line = raw.stripSuffix("\r")
      if (line.nonEmpty && !(lineNo == 1 && line.startsWith("#version"))) {
        val cut = line.indexOf(' ')
        if (cut <= 0 || cut != line.lastIndexOf(' ') ||
            cut == line.length - 1)
          throw new IllegalArgumentException(
            s"$path:$lineNo: expected 'lhs rhs', got '$line'")
        out += ((line.substring(0, cut), line.substring(cut + 1)))
      }
    }
    val merges = out.result()
    require(merges.nonEmpty, s"$path holds no merges")
    merges
  }

  private def tokenizerRoot(spark: SparkSession, path: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    finally in.close()
  }

  private def tokenizerModel(spark: SparkSession, path: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val model = tokenizerRoot(spark, path).get("model")
    require(model != null, s"$path has no 'model' object — not a " +
      "HuggingFace tokenizer.json")
    model
  }

  /** The pre-tokenizer KIND a tokenizer file declares — the dispatch
    * flag [[TextOps.bpeEncodeDispatch]] consumes. A `tokenizer.json`'s
    * `pre_tokenizer.type` decides: `ByteLevel` (or a `Sequence`
    * containing one) → `byte_level` — the GPT-2/RoBERTa/CLIP family
    * whose merge symbols are written in the bytes_to_unicode alphabet;
    * `Metaspace` → `metaspace` — the SentencePiece convention the
    * Llama/T5/Mistral family ships (▁-replacement; read the file's
    * replacement char and prepend scheme with
    * [[readMetaspaceConfig]]); `Whitespace`/`WhitespaceSplit` (or
    * null — tokenizers that pre-split upstream) → `whitespace`. Any
    * other declared type fails descriptively: silently routing a
    * table through the wrong splitter would produce ids that LOOK
    * valid and match nothing. A `merges.txt` path returns `byte_level`
    * — that line format is the GPT-2 distribution's. */
  def readPreTokenizerKind(spark: SparkSession, path: String): String = {
    if (!path.endsWith(".json")) return "byte_level"
    val pt = tokenizerRoot(spark, path).get("pre_tokenizer")
    def kindOf(node: com.fasterxml.jackson.databind.JsonNode): String = {
      val t = Option(node.get("type")).map(_.asText()).getOrElse("")
      t match {
        case "ByteLevel" => "byte_level"
        case "Metaspace" => "metaspace"
        case "Whitespace" | "WhitespaceSplit" => "whitespace"
        case "BertPreTokenizer" => "bert"
        case "Sequence" =>
          // the member that DECIDES the alphabet wins: a ByteLevel
          // anywhere means the merge symbols are byte-form; else a
          // Metaspace means ▁-form; plain splitters are the default
          val subs = node.get("pretokenizers")
          val it = if (subs == null) java.util.Collections
            .emptyIterator[com.fasterxml.jackson.databind.JsonNode]()
          else subs.elements()
          var found = "whitespace"
          while (it.hasNext) kindOf(it.next()) match {
            case "byte_level" => found = "byte_level"
            case "metaspace" if found != "byte_level" =>
              found = "metaspace"
            case _ =>
          }
          found
        case other => throw new IllegalArgumentException(
          s"$path: unsupported pre_tokenizer type '$other' — this " +
            "engine implements byte_level (GPT-2 family), metaspace " +
            "(SentencePiece family), and whitespace semantics")
      }
    }
    if (pt == null || pt.isNull) "whitespace" else kindOf(pt)
  }

  /** The SIMPLE normalizer kinds — Unicode normalization forms (the
    * [[graft.functions.UnicodeNormalize]] kernel) plus `Lowercase`:
    * the set the WRITERS accept and [[normalizerTransform]] maps by
    * bare name. The full parser ([[readNormalizerRules]]) additionally
    * handles StripAccents, Strip, Replace, Prepend, and
    * BertNormalizer (expanded to its flag-derived sub-chain);
    * anything else (Precompiled…) fails by name — silently skipping a
    * declared normalizer would encode accented/full-width text
    * differently than the shipping tokenizer stack does, producing
    * ids that LOOK valid and match nothing (the
    * [[readPreTokenizerKind]] rule). */
  private val SupportedNormalizers =
    Set("NFC", "NFD", "NFKC", "NFKD", "Lowercase")

  /** One parsed normalizer step — the engine's model of the
    * tokenizers library's normalizer zoo. The simple members map to
    * single codegen'd column ops; `BertNormalizer` is not a member:
    * the parser EXPANDS it into its flag-derived sub-chain
    * (clean_text → chinese-chars padding → strip-accents → lowercase,
    * the published composition order), so downstream only ever sees
    * primitive steps. */
  sealed trait NormRule { def name: String }
  object NormRule {
    /** NFC/NFD/NFKC/NFKD via [[graft.functions.UnicodeNormalize]]. */
    final case class Form(form: String) extends NormRule {
      def name: String = form
    }
    case object Lowercase extends NormRule {
      def name: String = "Lowercase" }
    /** NFD + drop combining marks (Mn) — café → cafe. */
    case object StripAccents extends NormRule {
      def name: String = "StripAccents" }
    /** Unicode-whitespace trim, each side independently. */
    final case class Strip(left: Boolean, right: Boolean)
        extends NormRule { def name: String = "Strip" }
    /** Literal or regex substitution (HF serializes the pattern as
      * `{"String": s}` or `{"Regex": s}`; regex semantics are Java's
      * — close to HF's oniguruma for the patterns real files carry,
      * documented approximation). */
    final case class Replace(regex: Boolean, pattern: String,
        content: String) extends NormRule { def name: String = "Replace" }
    /** Prefix prepend on non-empty text (the legacy-Llama ▁ shape). */
    final case class Prepend(prefix: String) extends NormRule {
      def name: String = "Prepend" }
    /** BertNormalizer's clean_text: drop NUL/U+FFFD and control chars
      * (categories Cc/Cf/Co/Cn, with tab/newline/CR exempt), then map
      * every whitespace char to a plain space. */
    case object BertCleanText extends NormRule {
      def name: String = "BertCleanText" }
    /** BertNormalizer's handle_chinese_chars: pad every CJK ideograph
      * (the published BMP + supplementary ranges) with spaces so each
      * becomes its own pre-token. */
    case object BertChineseChars extends NormRule {
      def name: String = "BertChineseChars" }
  }

  /** The flattened normalizer chain a `tokenizer.json` declares, as
    * parsed [[NormRule]]s: `normalizer` absent/null → empty (identity
    * — this engine never invents normalization the file didn't
    * declare); a single node → its rule; a `Sequence` → its members
    * in declared order (applied left to right, exactly as the
    * tokenizers library composes them); nested Sequences flatten;
    * `BertNormalizer` expands to its flag-derived sub-chain (the
    * bert-base-uncased day-one case). Unsupported members
    * (Precompiled, ByteLevel-as-normalizer, NFx variants this engine
    * lacks…) fail descriptively by name. */
  def readNormalizerRules(spark: SparkSession, path: String)
      : Seq[NormRule] = {
    val node = tokenizerRoot(spark, path).get("normalizer")
    def boolOf(n: com.fasterxml.jackson.databind.JsonNode,
               field: String, dflt: Boolean): Boolean =
      Option(n.get(field)).filter(_.isBoolean)
        .map(_.asBoolean()).getOrElse(dflt)
    def rulesOf(n: com.fasterxml.jackson.databind.JsonNode)
        : Seq[NormRule] = {
      val t = Option(n.get("type")).map(_.asText()).getOrElse("")
      t match {
        case "Sequence" =>
          val subs = n.get("normalizers")
          if (subs == null) Seq.empty
          else {
            val out = Vector.newBuilder[NormRule]
            val it = subs.elements()
            while (it.hasNext) out ++= rulesOf(it.next())
            out.result()
          }
        case "NFC" | "NFD" | "NFKC" | "NFKD" => Seq(NormRule.Form(t))
        case "Lowercase" => Seq(NormRule.Lowercase)
        case "StripAccents" => Seq(NormRule.StripAccents)
        case "Strip" => Seq(NormRule.Strip(
          boolOf(n, "strip_left", dflt = true),
          boolOf(n, "strip_right", dflt = true)))
        case "Prepend" =>
          val p = Option(n.get("prepend")).filter(_.isTextual)
            .map(_.asText()).getOrElse(throw new IllegalArgumentException(
              s"$path: Prepend normalizer without a 'prepend' string"))
          Seq(NormRule.Prepend(p))
        case "Replace" =>
          val pat = Option(n.get("pattern")).getOrElse(
            throw new IllegalArgumentException(
              s"$path: Replace normalizer without a pattern"))
          val content = Option(n.get("content")).filter(_.isTextual)
            .map(_.asText()).getOrElse(throw new IllegalArgumentException(
              s"$path: Replace normalizer without a 'content' string"))
          val lit = Option(pat.get("String")).filter(_.isTextual)
            .map(_.asText())
          val rex = Option(pat.get("Regex")).filter(_.isTextual)
            .map(_.asText())
          (lit, rex) match {
            case (Some(s), _) => Seq(NormRule.Replace(regex = false,
              s, content))
            case (_, Some(r)) => Seq(NormRule.Replace(regex = true,
              r, content))
            case _ => throw new IllegalArgumentException(
              s"$path: Replace pattern must be {String: …} or " +
                "{Regex: …}")
          }
        case "BertNormalizer" =>
          // the published flag semantics: strip_accents defaults to
          // FOLLOWING lowercase when absent/null
          val lower = boolOf(n, "lowercase", dflt = true)
          val strip = Option(n.get("strip_accents"))
            .filter(_.isBoolean).map(_.asBoolean()).getOrElse(lower)
          (if (boolOf(n, "clean_text", dflt = true))
             Seq(NormRule.BertCleanText) else Seq.empty) ++
          (if (boolOf(n, "handle_chinese_chars", dflt = true))
             Seq(NormRule.BertChineseChars) else Seq.empty) ++
          (if (strip) Seq(NormRule.StripAccents) else Seq.empty) ++
          (if (lower) Seq(NormRule.Lowercase) else Seq.empty)
        case other => throw new IllegalArgumentException(
          s"$path: unsupported normalizer type '$other' — this " +
            "engine implements NFC/NFD/NFKC/NFKD, Lowercase, " +
            "StripAccents, Strip, Replace, Prepend, BertNormalizer, " +
            "and Sequence compositions of those")
      }
    }
    if (node == null || node.isNull) Seq.empty else rulesOf(node)
  }

  /** The declared chain as kind NAMES (BertNormalizer arrives
    * pre-expanded) — the introspection face of
    * [[readNormalizerRules]]. */
  def readNormalizerKinds(spark: SparkSession, path: String)
      : Seq[String] = readNormalizerRules(spark, path).map(_.name)

  /** Compose parsed normalizer rules into the Column transform the
    * encoders consume — each rule one codegen'd map step, applied in
    * declared order in FRONT of pre-tokenization (the tokenizers
    * pipeline order: normalize, then split). Empty chain →
    * identity. */
  def normalizerTransformRules(rules: Seq[NormRule])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    c => rules.foldLeft(c) {
      case (acc, NormRule.Form(form)) =>
        graft.functions.UnicodeNormalize(acc, form)
      case (acc, NormRule.Lowercase) => lower(acc)
      case (acc, NormRule.StripAccents) =>
        regexp_replace(
          graft.functions.UnicodeNormalize(acc, "NFD"),
          "\\p{Mn}", "")
      case (acc, NormRule.Strip(l, r)) =>
        val afterL = if (l) regexp_replace(acc, "(?U)^\\s+", "")
                     else acc
        if (r) regexp_replace(afterL, "(?U)\\s+$", "") else afterL
      case (acc, NormRule.Replace(false, pat, content)) =>
        replace(acc, lit(pat), lit(content))
      case (acc, NormRule.Replace(true, pat, content)) =>
        regexp_replace(acc, pat, content)
      case (acc, NormRule.Prepend(p)) =>
        when(length(acc) > 0, concat(lit(p), acc)).otherwise(acc)
      case (acc, NormRule.BertCleanText) =>
        regexp_replace(
          regexp_replace(acc,
            "[\\x00\\uFFFD]|[\\p{Cc}\\p{Cf}\\p{Co}\\p{Cn}&&[^\\t\\n\\r]]",
            ""),
          "[\\t\\n\\r\\p{Zs}]", " ")
      case (acc, NormRule.BertChineseChars) =>
        regexp_replace(acc,
          "([\\u4E00-\\u9FFF\\u3400-\\u4DBF\\uF900-\\uFAFF" +
            "\\x{20000}-\\x{2A6DF}\\x{2A700}-\\x{2B73F}" +
            "\\x{2B740}-\\x{2B81F}\\x{2B820}-\\x{2CEAF}" +
            "\\x{2F800}-\\x{2FA1F}])",
          " $1 ")
    }
  }

  /** [[normalizerTransformRules]] over bare kind names — the simple
    * public set only ([[SupportedNormalizers]] + StripAccents); the
    * parameterized rules (Strip/Replace/Prepend/Bert*) only arise
    * from file parsing. */
  def normalizerTransform(kinds: Seq[String])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    normalizerTransformRules(kinds.map {
      case "Lowercase" => NormRule.Lowercase
      case "StripAccents" => NormRule.StripAccents
      case f if SupportedNormalizers.contains(f) => NormRule.Form(f)
      case other => throw new IllegalArgumentException(
        s"unsupported normalizer kind '$other'")
    })

  /** The (replacement char, prepend scheme) a Metaspace pre-tokenizer
    * declares — [[graft.text.TextOps.metaspacePreTokens]]'s two knobs.
    * Defaults are the family's own (`▁`, `always`); the legacy
    * `add_prefix_space` boolean (tokenizers < 0.14 serializations)
    * maps true→`always` / false→`never` when `prepend_scheme` is
    * absent. Descends into a `Sequence` to find the Metaspace member;
    * fails descriptively when the file declares none. */
  def readMetaspaceConfig(spark: SparkSession, path: String)
      : (String, String) = {
    def find(node: com.fasterxml.jackson.databind.JsonNode)
        : Option[com.fasterxml.jackson.databind.JsonNode] = {
      val t = Option(node.get("type")).map(_.asText()).getOrElse("")
      if (t == "Metaspace") Some(node)
      else if (t == "Sequence") {
        val subs = node.get("pretokenizers")
        if (subs == null) None
        else {
          var out: Option[com.fasterxml.jackson.databind.JsonNode] = None
          val it = subs.elements()
          while (it.hasNext && out.isEmpty) out = find(it.next())
          out
        }
      } else None
    }
    val pt = tokenizerRoot(spark, path).get("pre_tokenizer")
    val node = Option(pt).filterNot(_.isNull).flatMap(find)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no Metaspace pre_tokenizer declared"))
    val repl = Option(node.get("replacement")).filter(_.isTextual)
      .map(_.asText()).getOrElse("▁")
    val scheme = Option(node.get("prepend_scheme")).filter(_.isTextual)
      .map(_.asText())
      .orElse(Option(node.get("add_prefix_space")).filter(_.isBoolean)
        .map(b => if (b.asBoolean()) "always" else "never"))
      .getOrElse("always")
    require(Set("always", "first", "never").contains(scheme),
      s"$path: unsupported prepend_scheme '$scheme'")
    (repl, scheme)
  }

  /** Parse `model.merges` out of a HuggingFace `tokenizer.json`. Both
    * on-disk encodings are accepted: the classic array of `"lhs rhs"`
    * strings and the newer array of `["lhs", "rhs"]` two-element arrays
    * (tokenizers >= 0.20 serializes the latter). Rank is array order. */
  def readTokenizerJsonMerges(spark: SparkSession, path: String)
      : Seq[(String, String)] = {
    val merges = tokenizerModel(spark, path).get("merges")
    require(merges != null && merges.isArray,
      s"$path: model.merges is missing or not an array")
    val out = Vector.newBuilder[(String, String)]
    val it = merges.elements()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      if (e.isTextual) {
        val s = e.asText()
        val cut = s.indexOf(' ')
        require(cut > 0 && cut == s.lastIndexOf(' ') && cut < s.length - 1,
          s"$path: model.merges[$i] is not 'lhs rhs': '$s'")
        out += ((s.substring(0, cut), s.substring(cut + 1)))
      } else if (e.isArray && e.size() == 2) {
        out += ((e.get(0).asText(), e.get(1).asText()))
      } else throw new IllegalArgumentException(
        s"$path: model.merges[$i] is neither 'lhs rhs' nor [lhs, rhs]")
      i += 1
    }
    val result = out.result()
    require(result.nonEmpty, s"$path: model.merges is empty")
    result
  }

  /** Parse `model.vocab` (token -> id) out of a `tokenizer.json` as a
    * (token STRING, id INT) DataFrame — vocab-sized (tens of thousands
    * of rows), the natural join/broadcast side for token-id lookups. */
  def readTokenizerJsonVocab(spark: SparkSession, path: String)
      : DataFrame = {
    val vocab = tokenizerModel(spark, path).get("vocab")
    require(vocab != null && vocab.isObject,
      s"$path: model.vocab is missing or not an object")
    val rows = Vector.newBuilder[(String, Int)]
    val it = vocab.fields()
    while (it.hasNext) {
      val e = it.next()
      rows += ((e.getKey, e.getValue.asInt()))
    }
    import spark.implicits._
    rows.result().toDF("token", "id")
  }

  /** One-call path from a `tokenizer.json` to the broadcast vocab
    * handle [[TextOps.bpeEncodeIdsKernel]] consumes — the id half of
    * pointing the engine at a shipped tokenizer. */
  def vocabBroadcastFromFile(spark: SparkSession, path: String)
      : org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, Integer]] = {
    val vocab = tokenizerModel(spark, path).get("vocab")
    require(vocab != null && vocab.isObject,
      s"$path: model.vocab is missing or not an object")
    val m = new java.util.HashMap[String, Integer]()
    val it = vocab.fields()
    while (it.hasNext) {
      val e = it.next()
      m.put(e.getKey, Integer.valueOf(e.getValue.asInt()))
    }
    require(!m.isEmpty, s"$path: model.vocab is empty")
    spark.sparkContext.broadcast(m)
  }

  /** Write a merge table in the GPT-2 `merges.txt` line format — the
    * EXPORT half of [[readMergesTxt]], closing the train-to-ship loop:
    * [[TextOps.bpeTrainByteLevel]]'s learned table leaves the engine
    * as a file any tokenizer stack ingests. `#version: 0.2` header,
    * one `lhs rhs` line per merge in rank order; driver-side write
    * through the Hadoop FS (the table is an operator constant — a few
    * MB at 50k merges). Round-trips [[readMergesTxt]] bit-for-bit. */
  def writeMergesTxt(spark: SparkSession, merges: Seq[(String, String)],
                     path: String): Unit = {
    require(merges.nonEmpty, "merge table must not be empty")
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !a.contains(" ") &&
        !b.contains(" ") && !a.contains("\n") && !b.contains("\n"),
        s"symbol pair ('$a', '$b') is not merges.txt-representable") }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val sb = new StringBuilder("#version: 0.2\n")
      merges.foreach { case (a, b) => sb.append(a).append(' ')
        .append(b).append('\n') }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
  }

  /** Write a HuggingFace `tokenizer.json` for a BPE model — the SHIP
    * format the fast-tokenizer stack ingests, closing the
    * train-to-ship loop for all three BPE families
    * ([[writeMergesTxt]] covers the bare GPT-2 line format):
    * `pre_tokenizer` by declared kind (`byte_level` → ByteLevel,
    * `metaspace` → Metaspace with its replacement + prepend scheme,
    * `whitespace` → WhitespaceSplit), `model.vocab` (token → id),
    * `model.merges` as `"lhs rhs"` strings in rank order. Round-trips
    * [[loadTokenizer]] — family, declared config, and encode.
    * Driver-side constant write, the [[writeMergesTxt]] contract. */
  def writeTokenizerJsonBpe(spark: SparkSession, path: String,
      merges: Seq[(String, String)], vocab: Seq[(String, Int)],
      preTokenizer: String = "metaspace",
      replacement: String = "▁", prependScheme: String = "always",
      unk: Option[String] = None,
      normalizers: Seq[String] = Nil,
      addedTokens: Seq[(String, Long)] = Nil,
      byteFallback: Boolean = false): Unit = {
    require(merges.nonEmpty, "merge table must not be empty")
    require(vocab.nonEmpty, "vocab must not be empty")
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocab tokens must be distinct")
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !a.contains(" ") &&
        !b.contains(" "),
        s"symbol pair ('$a', '$b') is not merges-representable") }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    putNormalizer(root, normalizers)
    putAddedTokens(root, addedTokens)
    val pt = root.putObject("pre_tokenizer")
    preTokenizer match {
      case "byte_level" => pt.put("type", "ByteLevel")
      case "metaspace" =>
        require(replacement.length == 1 && !replacement.contains(" "),
          s"metaspace replacement must be one non-space char, " +
            s"got '$replacement'")
        require(Set("always", "first", "never").contains(prependScheme),
          s"prepend_scheme must be always/first/never, " +
            s"got '$prependScheme'")
        pt.put("type", "Metaspace")
        pt.put("replacement", replacement)
        pt.put("prepend_scheme", prependScheme)
        pt.put("split", true)
      case "whitespace" => pt.put("type", "WhitespaceSplit")
      case other => throw new IllegalArgumentException(
        s"unknown pre-tokenizer kind '$other' (expected byte_level, " +
          "metaspace, or whitespace)")
    }
    val model = root.putObject("model")
    model.put("type", "BPE")
    unk.foreach(u => model.put("unk_token", u))
    if (byteFallback) model.put("byte_fallback", true)
    val v = model.putObject("vocab")
    vocab.foreach { case (tok, id) => v.put(tok, id) }
    val m = model.putArray("merges")
    merges.foreach { case (a, b) => m.add(s"$a $b") }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out.close()
  }

  /** Write a HuggingFace `tokenizer.json` for a UNIGRAM model — the
    * ship format for [[graft.text.TextOps.unigramTrain]]'s learned
    * vocabulary ([[writeTokenizerJsonBpe]]'s sibling): `model.vocab`
    * as the `[piece, score]` pair array (scores are the log
    * probabilities [[graft.text.TextOps.unigramSegment]] consumes),
    * optionally a Metaspace pre_tokenizer (the T5 shape — the ▁-form
    * word-domain builder comes back on load). Round-trips
    * [[loadTokenizer]]. */
  def writeTokenizerJsonUnigram(spark: SparkSession, path: String,
      vocab: Seq[(String, Double)], metaspace: Boolean = false,
      replacement: String = "▁", prependScheme: String = "always",
      unk: Option[String] = None,
      normalizers: Seq[String] = Nil): Unit = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocab pieces must be distinct")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    putNormalizer(root, normalizers)
    if (metaspace) {
      val pt = root.putObject("pre_tokenizer")
      pt.put("type", "Metaspace")
      pt.put("replacement", replacement)
      pt.put("prepend_scheme", prependScheme)
      pt.put("split", true)
    }
    val model = root.putObject("model")
    model.put("type", "Unigram")
    unk.foreach(u => model.put("unk_token", u))
    val v = model.putArray("vocab")
    vocab.foreach { case (piece, lnp) =>
      val e = v.addArray(); e.add(piece); e.add(lnp)
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out.close()
  }

  /** One parsed `added_tokens` entry — the vocabulary a tokenizer.json
    * adds OUTSIDE its model (`<s>`, `</s>`, `<|endoftext|>`,
    * `<extra_id_N>`…): `content` is the literal surface form extracted
    * from the text before the model ever sees it, `id` the entry's own
    * id, `special` the control-token flag. `normalized` is carried for
    * validation ([[loadTokenizer]] rejects `normalized: true` next to
    * a declared normalizer — extraction-after-normalization is a
    * different pipeline this engine doesn't fake). */
  final case class AddedToken(content: String, id: Long,
      special: Boolean, normalized: Boolean)

  /** The `added_tokens` a tokenizer.json declares, in file order.
    * Absent → empty. Entries declaring `lstrip`/`rstrip`/
    * `single_word` true fail by name (the [[readPreTokenizerKind]]
    * rule: silently ignoring declared semantics would extract
    * differently than the shipping stack); duplicate contents and
    * contents containing U+0000 (the extraction fence) fail too. */
  def readAddedTokens(spark: SparkSession, path: String)
      : Seq[AddedToken] = {
    val node = tokenizerRoot(spark, path).get("added_tokens")
    if (node == null || node.isNull) return Seq.empty
    require(node.isArray, s"$path: added_tokens must be an array")
    val out = Vector.newBuilder[AddedToken]
    val it = node.elements()
    while (it.hasNext) {
      val e = it.next()
      val content = Option(e.get("content")).filter(_.isTextual)
        .map(_.asText()).getOrElse(throw new IllegalArgumentException(
          s"$path: added_tokens entry without a 'content' string"))
      require(content.nonEmpty && !content.contains("\u0000"),
        s"$path: added token content '$content' is empty or carries " +
          "U+0000 (the extraction fence)")
      val id = Option(e.get("id")).filter(_.isIntegralNumber)
        .map(_.asLong()).getOrElse(throw new IllegalArgumentException(
          s"$path: added token '$content' without an integral 'id'"))
      Seq("lstrip", "rstrip", "single_word").foreach { f =>
        val v = e.get(f)
        require(v == null || v.isNull || !v.asBoolean(),
          s"$path: added token '$content' declares $f=true — this " +
            "engine extracts added tokens verbatim (no edge " +
            "stripping, no word-boundary guard)")
      }
      def boolOf(f: String, dflt: Boolean): Boolean =
        Option(e.get(f)).filter(_.isBoolean).map(_.asBoolean())
          .getOrElse(dflt)
      out += AddedToken(content, id, boolOf("special", dflt = false),
        boolOf("normalized", dflt = false))
    }
    val toks = out.result()
    require(toks.map(_.content).distinct.size == toks.size,
      s"$path: duplicate added_tokens contents")
    toks
  }

  /** The regex alternation that finds added-token occurrences —
    * longest content first, so a token that is a prefix of another
    * (`<extra_id_9>` vs `<extra_id_99>`) never shadows it; every
    * content is quoted (literals, not patterns). */
  private def addedTokensPattern(contents: Seq[String]): String =
    "(" + contents.sortBy(t => (-t.length, t))
      .map(java.util.regex.Pattern.quote).mkString("|") + ")"

  /** Wrap a family encoder so declared added tokens are EXTRACTED
    * before the model sees the text — the tokenizers library's
    * AddedVocabulary semantics for `normalized: false` entries: the
    * text splits at added-token occurrences (glued or free-standing),
    * each occurrence emits as its own single-piece word, and every
    * remaining segment rides the base encoder independently
    * (normalization INSIDE the base applies per segment, exactly the
    * shipping split-then-normalize order). Pure column ops: one
    * regexp fence on U+0000 (rejected inside contents by
    * [[readAddedTokens]]) + split + per-segment dispatch; the plan
    * stays O(1) in corpus size and the added list rides the plan as
    * literals — added vocabularies are tens of entries, the
    * [[readPreTokenizerKind]] constant class. */
  def addedTokensEncode(contents: Seq[String],
      base: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(contents.nonEmpty, "added-token list must not be empty")
    val pat = addedTokensPattern(contents)
    c => {
      val fenced = regexp_replace(coalesce(c, lit("")), pat,
        "\u0000$1\u0000")
      flatten(transform(split(fenced, "\u0000"), seg =>
        when(seg.isin(contents: _*), array(seg)).otherwise(base(seg))))
    }
  }

  /** Per-row count of added-token occurrences — the SAME fence regex
    * as [[addedTokensEncode]], so budget counting and extraction can
    * never disagree (a substring-of-another content would double-count
    * under per-token replace arithmetic). */
  def addedTokensCount(contents: Seq[String])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val pat = addedTokensPattern(contents)
    c => size(filter(
      split(regexp_replace(coalesce(c, lit("")), pat,
        "\u0000$1\u0000"), "\u0000"),
      seg => seg.isin(contents: _*))).cast("long")
  }

  /** Blank every added-token occurrence to a single space — what the
    * Unigram word-DOMAIN builder runs in front of ([[loadTokenizer]]):
    * control markup must not pollute the distinct-word table (a
    * `▁<s>`-form word has no vocab pieces and would silently segment
    * to nothing), and a space is the one separator every domain
    * builder (whitespace and Metaspace alike) treats as a boundary. */
  def stripAddedTokens(contents: Seq[String])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val pat = addedTokensPattern(contents)
    c => regexp_replace(coalesce(c, lit("")), pat, " ")
  }

  /** Write a HuggingFace `tokenizer.json` for a WORDPIECE model —
    * the ship format for a BERT-family vocabulary, completing the
    * writer trio ([[writeTokenizerJsonBpe]] /
    * [[writeTokenizerJsonUnigram]]; [[writeVocabTxt]] covers the bare
    * line format): `model.vocab` (token → id), the declared
    * `unk_token` and `max_input_chars_per_word` (the two knobs
    * [[loadTokenizer]]'s WordPiece leg honors over call-site
    * defaults), a `BertPreTokenizer` declaration, and either a simple
    * normalizer chain (`normalizers`, the shared [[putNormalizer]]
    * serialization) or the composite `BertNormalizer` node
    * (`bertNormalizer = true` — written with its published defaults,
    * which [[readNormalizerRules]] expands back to clean_text → CJK
    * padding → strip-accents → lowercase). Round-trips
    * [[loadTokenizer]]. Driver-side constant write, the
    * [[writeMergesTxt]] contract. */
  def writeTokenizerJsonWordPiece(spark: SparkSession, path: String,
      vocab: Seq[(String, Int)], unk: String = "[UNK]",
      maxChars: Int = 100, normalizers: Seq[String] = Nil,
      bertNormalizer: Boolean = false): Unit = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocab tokens must be distinct")
    require(vocab.exists(_._1 == unk),
      s"unk token '$unk' must itself be a vocab entry — WordPiece's " +
        "encode vocab is its id vocab")
    require(!(bertNormalizer && normalizers.nonEmpty),
      "pass EITHER a simple normalizer chain OR bertNormalizer, " +
        "not both — BertNormalizer is itself a composite")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    if (bertNormalizer)
      root.putObject("normalizer").put("type", "BertNormalizer")
    else putNormalizer(root, normalizers)
    root.putObject("pre_tokenizer").put("type", "BertPreTokenizer")
    val model = root.putObject("model")
    model.put("type", "WordPiece")
    model.put("unk_token", unk)
    model.put("max_input_chars_per_word", maxChars)
    val v = model.putObject("vocab")
    vocab.foreach { case (tok, id) => v.put(tok, id) }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out.close()
  }

  /** Serialize `(content, id)` pairs as special `added_tokens` — the
    * WRITE half of [[readAddedTokens]]: each entry ships
    * `special: true, normalized: false` and every edge flag off (the
    * exact shape the reader accepts). Empty → no node. */
  private def putAddedTokens(
      root: com.fasterxml.jackson.databind.node.ObjectNode,
      addedTokens: Seq[(String, Long)]): Unit = {
    if (addedTokens.isEmpty) return
    require(addedTokens.map(_._1).distinct.size == addedTokens.size,
      "added-token contents must be distinct")
    val arr = root.putArray("added_tokens")
    addedTokens.foreach { case (content, id) =>
      require(content.nonEmpty && !content.contains("\u0000"),
        s"added token '$content' is empty or carries U+0000 (the " +
          "extraction fence)")
      val o = arr.addObject()
      o.put("id", id)
      o.put("content", content)
      o.put("single_word", false)
      o.put("lstrip", false)
      o.put("rstrip", false)
      o.put("normalized", false)
      o.put("special", true)
    }
  }

  /** Serialize a normalizer-kind chain into a tokenizer.json root —
    * the WRITE half of [[readNormalizerKinds]]: empty → no node,
    * one kind → its bare object, several → a Sequence in order.
    * Round-trips the reader exactly. */
  private def putNormalizer(
      root: com.fasterxml.jackson.databind.node.ObjectNode,
      normalizers: Seq[String]): Unit = {
    normalizers.foreach(k =>
      require(SupportedNormalizers.contains(k),
        s"unsupported normalizer kind '$k' (expected one of " +
          s"${SupportedNormalizers.toSeq.sorted.mkString("/")})"))
    if (normalizers.size == 1) {
      root.putObject("normalizer").put("type", normalizers.head)
    } else if (normalizers.nonEmpty) {
      val seqNode = root.putObject("normalizer")
      seqNode.put("type", "Sequence")
      val arr = seqNode.putArray("normalizers")
      normalizers.foreach(k => arr.addObject().put("type", k))
    }
  }

  /** The model FAMILY a `tokenizer.json` declares (`model.type`):
    * `BPE`, `WordPiece`, or `Unigram` — the flag deciding which of the
    * engine's three encoders a shipped file feeds ([[TextOps
    * .bpeEncodeDispatch]] for BPE by pre-tokenizer kind,
    * [[TextOps.wordpieceEncode]] for WordPiece, the unigram segmenter
    * for Unigram). A missing `model.type` fails descriptively. */
  def readModelType(spark: SparkSession, path: String): String = {
    val t = tokenizerModel(spark, path).get("type")
    require(t != null && t.isTextual,
      s"$path: model.type is missing — cannot dispatch an encoder")
    t.asText()
  }

  /** Parse a BERT-style `vocab.txt`: ONE TOKEN PER LINE, id = 0-based
    * line order (the format every WordPiece distribution ships —
    * bert-base, multilingual BERT, DistilBERT). Trailing `\r` is
    * stripped (CRLF saves); a blank line fails with its line number —
    * a vocab entry cannot be empty, and silently skipping would shift
    * every later id. Driver-side constant read, the
    * [[readMergesTxt]] contract: line order IS the id assignment and
    * a distributed scan cannot guarantee it. */
  def readVocabTxt(spark: SparkSession, path: String)
      : Seq[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var lineNo = 0
    openLines(spark, path).foreach { raw =>
      val line = raw.stripSuffix("\r")
      if (line.isEmpty)
        throw new IllegalArgumentException(
          s"$path:${lineNo + 1}: blank vocab line — ids would shift")
      out += ((line, lineNo))
      lineNo += 1
    }
    val vocab = out.result()
    require(vocab.nonEmpty, s"$path holds no vocab entries")
    vocab
  }

  /** Write a vocabulary in the `vocab.txt` line format — the EXPORT
    * half of [[readVocabTxt]]. Entries must arrive DENSE in id order
    * (0..n-1): the format has no id column, line order carries it.
    * Round-trips [[readVocabTxt]] bit-for-bit. */
  def writeVocabTxt(spark: SparkSession, vocab: Seq[(String, Int)],
                    path: String): Unit = {
    require(vocab.nonEmpty, "vocab must not be empty")
    vocab.zipWithIndex.foreach { case ((tok, id), i) =>
      require(id == i, s"vocab ids must be dense line order: entry " +
        s"$i ('$tok') carries id $id")
      require(tok.nonEmpty && !tok.contains("\n") && !tok.contains("\r"),
        s"token '$tok' is not vocab.txt-representable")
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val sb = new StringBuilder
      vocab.foreach { case (tok, _) => sb.append(tok).append('\n') }
      out.write(sb.toString.getBytes("UTF-8"))
    } finally out.close()
  }

  /** One-call path from a WordPiece vocab file to the encode kernel's
    * broadcast handle: `vocab.txt` and `tokenizer.json` (model.vocab
    * of a WordPiece model) are auto-detected by suffix. Feed the
    * result to [[TextOps.wordpieceEncode]]. */
  def wordpieceVocabBroadcastFromFile(spark: SparkSession, path: String,
      unk: String = "[UNK]", maxChars: Int = 100)
      : org.apache.spark.broadcast.Broadcast[
        graft.functions.WordPiece.Vocab] = {
    val vocab =
      if (path.endsWith(".json")) {
        val node = tokenizerModel(spark, path).get("vocab")
        require(node != null && node.isObject,
          s"$path: model.vocab is missing or not an object")
        val rows = Vector.newBuilder[(String, Int)]
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          rows += ((e.getKey, e.getValue.asInt()))
        }
        rows.result()
      } else readVocabTxt(spark, path)
    TextOps.wordpieceVocabBroadcast(spark, vocab, unk, maxChars)
  }

  /** One SentencePiece vocabulary entry out of a `.model` file:
    * the piece string, its score (a LOG PROBABILITY for unigram
    * models — feeds [[TextOps.unigramSegment]]'s `lnp` directly),
    * the piece type (1=NORMAL, 2=UNKNOWN, 3=CONTROL, 4=USER_DEFINED,
    * 5=UNUSED, 6=BYTE), and the id (= file order, the tokenizer's
    * own id assignment). */
  case class SpPiece(piece: String, score: Double, ptype: Int, id: Int)

  private def readAllBytes(spark: SparkSession, path: String)
      : Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Minimal protobuf wire-format cursor — the same
    * public-wire-format-by-hand approach as the TFRecord sink (the
    * format is stable and published; no library dependency). */
  private final class ProtoCursor(val b: Array[Byte], var pos: Int,
                                  val end: Int, path: String) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var out = 0L
      var more = true
      while (more) {
        require(pos < end && shift < 64,
          s"$path: truncated or malformed varint at byte $pos")
        val x = b(pos) & 0xff
        out |= (x & 0x7fL) << shift
        shift += 7
        pos += 1
        more = (x & 0x80) != 0
      }
      out
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end,
        s"$path: truncated field at byte $pos (need $n)")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => bytes(8)
      case 2 => bytes(varint().toInt)
      case 5 => bytes(4)
      case other => throw new IllegalArgumentException(
        s"$path: unsupported wire type $other at byte $pos")
    }
  }

  /** Parse a SentencePiece `.model` file (the serialized `ModelProto`
    * of the public sentencepiece_model.proto — the fourth and last
    * tokenizer distribution format next to merges.txt, tokenizer.json,
    * and vocab.txt): repeated `SentencePiece` entries (field 1 —
    * piece string, float score, type enum) in file order. Hand-decoded
    * from the published wire format, driver-side (operator constant,
    * the [[readMergesTxt]] contract). Unknown fields — trainer spec,
    * normalizer blobs, future extensions — are SKIPPED by wire type,
    * exactly as protobuf consumers must. */
  def readSentencePieceModel(spark: SparkSession, path: String)
      : Seq[SpPiece] = {
    val raw = readAllBytes(spark, path)
    val c = new ProtoCursor(raw, 0, raw.length, path)
    val out = Vector.newBuilder[SpPiece]
    var id = 0
    while (c.hasMore) {
      val key = c.varint()
      val field = (key >> 3).toInt
      val wt = (key & 7).toInt
      if (field == 1 && wt == 2) {
        val len = c.varint().toInt
        val sub = new ProtoCursor(c.b, c.pos, c.pos + len, path)
        c.bytes(len)
        var piece: String = null
        var score = 0.0
        var ptype = 1 // proto3-style default: NORMAL
        while (sub.hasMore) {
          val k2 = sub.varint()
          ((k2 >> 3).toInt, (k2 & 7).toInt) match {
            case (1, 2) =>
              piece = new String(sub.bytes(sub.varint().toInt), "UTF-8")
            case (2, 5) =>
              val fb = sub.bytes(4)
              score = java.lang.Float.intBitsToFloat(
                (fb(0) & 0xff) | ((fb(1) & 0xff) << 8) |
                  ((fb(2) & 0xff) << 16) | ((fb(3) & 0xff) << 24))
                .toDouble
            case (3, 0) => ptype = sub.varint().toInt
            case (_, w) => sub.skip(w)
          }
        }
        require(piece != null,
          s"$path: SentencePiece entry $id has no piece string")
        out += SpPiece(piece, score, ptype, id)
        id += 1
      } else c.skip(wt)
    }
    val pieces = out.result()
    require(pieces.nonEmpty, s"$path holds no sentencepiece entries")
    pieces
  }

  /** The `trainer_spec.model_type` a `.model` declares (1=UNIGRAM,
    * 2=BPE, 3=WORD, 4=CHAR; UNIGRAM when absent — the proto default):
    * the dispatch flag deciding which encoder the piece table feeds. */
  def readSentencePieceModelType(spark: SparkSession,
                                 path: String): Int = {
    val raw = readAllBytes(spark, path)
    val c = new ProtoCursor(raw, 0, raw.length, path)
    var mt = 1
    while (c.hasMore) {
      val key = c.varint()
      val field = (key >> 3).toInt
      val wt = (key & 7).toInt
      if (field == 2 && wt == 2) {
        val len = c.varint().toInt
        val sub = new ProtoCursor(c.b, c.pos, c.pos + len, path)
        c.bytes(len)
        while (sub.hasMore) {
          val k2 = sub.varint()
          if ((k2 >> 3).toInt == 3 && (k2 & 7).toInt == 0)
            mt = sub.varint().toInt
          else sub.skip((k2 & 7).toInt)
        }
      } else c.skip(wt)
    }
    mt
  }

  /** The `normalizer_spec.name` a SentencePiece `.model` declares
    * (ModelProto field 3, NormalizerSpec field 1) — None when the file
    * carries no normalizer_spec. Real sentencepiece distributions
    * always serialize one (`nmt_nfkc` is the trainer default;
    * `nmt_nfkc_cf` the cased-fold variant; `identity` opt-out). */
  def readSentencePieceNormalizerName(spark: SparkSession,
                                      path: String): Option[String] = {
    val raw = readAllBytes(spark, path)
    val c = new ProtoCursor(raw, 0, raw.length, path)
    var name: Option[String] = None
    while (c.hasMore) {
      val key = c.varint()
      val field = (key >> 3).toInt
      val wt = (key & 7).toInt
      if (field == 3 && wt == 2) {
        val len = c.varint().toInt
        val sub = new ProtoCursor(c.b, c.pos, c.pos + len, path)
        c.bytes(len)
        while (sub.hasMore) {
          val k2 = sub.varint()
          if ((k2 >> 3).toInt == 1 && (k2 & 7).toInt == 2)
            name = Some(new String(sub.bytes(sub.varint().toInt),
              "UTF-8"))
          else sub.skip((k2 & 7).toInt)
        }
      } else c.skip(wt)
    }
    name
  }

  /** Map a declared SentencePiece normalizer name to the engine's
    * normalizer-kind chain: `identity` (or an absent spec — hand-made
    * files; this engine never invents normalization) → empty;
    * `nmt_nfkc`/`nfkc` → NFKC (the NMT-specific extras — control-char
    * scrubbing, space collapsing — are a documented approximation gap:
    * the dominant effect, compatibility folding, is exact);
    * `nmt_nfkc_cf`/`nfkc_cf` → NFKC then Lowercase (case folding
    * approximated by lower — they differ only on locale-special casing
    * like İ/ß). Unknown names fail descriptively. */
  def sentencePieceNormalizerKinds(name: Option[String],
                                   path: String): Seq[String] =
    name match {
      case None | Some("identity") => Seq.empty
      case Some("nmt_nfkc") | Some("nfkc") => Seq("NFKC")
      case Some("nmt_nfkc_cf") | Some("nfkc_cf") =>
        Seq("NFKC", "Lowercase")
      case Some(other) => throw new IllegalArgumentException(
        s"$path: unsupported normalizer_spec.name '$other' — this " +
          "engine maps identity, nmt_nfkc[_cf], and nfkc[_cf]")
    }

  /** Write a SentencePiece `.model` (serialized ModelProto of the
    * public sentencepiece_model.proto) — the EXPORT half of
    * [[readSentencePieceModel]], closing the train-to-ship loop for
    * the fourth distribution format: repeated SentencePiece entries
    * (piece, float score, NORMAL type) in id order, a TrainerSpec
    * declaring model_type UNIGRAM, and a NormalizerSpec carrying
    * `normalizerName`. Hand-encoded wire format (the
    * [[readSentencePieceModel]] contract — stable, published, no
    * library dependency); round-trips the readers bit-for-bit. */
  def writeSentencePieceModel(spark: SparkSession, path: String,
      vocab: Seq[(String, Double)],
      normalizerName: String = "nmt_nfkc"): Unit = {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocab pieces must be distinct")
    val out = new java.io.ByteArrayOutputStream()
    def varint(buf: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      buf.write(v.toInt)
    }
    def lenDelim(buf: java.io.ByteArrayOutputStream, field: Int,
                 payload: Array[Byte]): Unit = {
      varint(buf, (field.toLong << 3) | 2)
      varint(buf, payload.length.toLong)
      buf.write(payload)
    }
    vocab.foreach { case (piece, score) =>
      val sp = new java.io.ByteArrayOutputStream()
      lenDelim(sp, 1, piece.getBytes("UTF-8"))
      // field 2, wire type 5 (fixed32): float score
      varint(sp, (2L << 3) | 5)
      val bits = java.lang.Float.floatToIntBits(score.toFloat)
      sp.write(bits & 0xff); sp.write((bits >> 8) & 0xff)
      sp.write((bits >> 16) & 0xff); sp.write((bits >> 24) & 0xff)
      varint(sp, (3L << 3) | 0) // field 3: type = NORMAL(1)
      varint(sp, 1L)
      lenDelim(out, 1, sp.toByteArray)
    }
    val ts = new java.io.ByteArrayOutputStream()
    varint(ts, (3L << 3) | 0) // TrainerSpec.model_type = UNIGRAM(1)
    varint(ts, 1L)
    lenDelim(out, 2, ts.toByteArray)
    val ns = new java.io.ByteArrayOutputStream()
    lenDelim(ns, 1, normalizerName.getBytes("UTF-8"))
    lenDelim(out, 3, ns.toByteArray)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write(out.toByteArray) finally o.close()
  }

  /** The unigram-segmenter vocabulary out of a `.model`: NORMAL and
    * USER_DEFINED pieces as a (piece, lnp) frame —
    * [[TextOps.unigramSegment]]'s vocab side, scores passing through
    * as the log probabilities they are.
    *
    * CONTROL pieces (`<s>`/`</s>`, ptype 3) are deliberately NOT
    * carried as extraction specials — the asymmetry with the
    * tokenizer.json route's `added_tokens` is each format's own
    * shipping semantics: HF's AddedVocabulary extracts declared
    * specials from raw text ([[addedTokensEncode]]), while
    * SentencePiece control symbols never match input (the CALLER
    * inserts them around encoded pieces; a literal `<s>` in raw text
    * segments as ordinary characters). Faking HF extraction on a
    * `.model` would encode differently than the sentencepiece library
    * the file shipped for. */
  def sentencePieceVocab(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readSentencePieceModel(spark, path)
      .filter(p => p.ptype == 1 || p.ptype == 4)
      .map(p => (p.piece, p.score))
      .toDF("piece", "lnp")
  }

  /** A loaded tokenizer, whatever file format it shipped in: `encode`
    * maps a document text column to its array of per-word (or
    * per-pre-token) piece strings; `family` names the dispatched
    * encoder (`bpe_byte_level`, `bpe_whitespace`, `wordpiece`,
    * `unigram`). The unigram leg exposes the (piece, lnp) vocab for
    * [[TextOps.unigramSegment]] instead of a column encoder (its DP
    * runs on the distinct-word DOMAIN, not per row — using it per-row
    * would hide a corpus-shaped cost inside a projection). The unigram
    * leg also carries `preTokens` — how the caller must build that
    * word domain before segmenting: [[TextOps.metaspacePreTokens]]
    * with the file's declared replacement/scheme for a T5-style
    * Metaspace file, the whitespace split otherwise. */
  sealed trait LoadedTokenizer { def family: String }
  final case class ColumnTokenizer(family: String,
      encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
    extends LoadedTokenizer
  final case class UnigramTokenizer(family: String, vocab: DataFrame,
      preTokens: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column = defaultUnigramPreTokens,
      specials: Seq[String] = Nil)
    extends LoadedTokenizer

  /** The default unigram word-domain builder (the q235 convention) —
    * [[TextOps.wordDomain]]. File-declared normalizers compose in
    * FRONT of this inside [[loadTokenizer]]. */
  def defaultUnigramPreTokens(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = TextOps.wordDomain(c)

  /** The REAL token budget under a loaded tokenizer — a (text column →
    * LONG count) function for the packers' `countWith` knob
    * ([[graft.text.TextOps.packSequencesGreedy]] et al.), so packs
    * fill by the tokens the trainer will actually see instead of the
    * whitespace proxy (which under- and over-counts 2-4× on code and
    * CJK). Works for every column-encoder family (each emits one
    * space-separated symbol string per pre-token); a Unigram tokenizer
    * fails descriptively — its segmentation runs on the distinct-word
    * DOMAIN ([[graft.text.TextOps.unigramSegment]]), and hiding that
    * corpus-shaped cost inside a per-row counter would be a lie. */
  def tokenCounter(lt: LoadedTokenizer)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    lt match {
      case ColumnTokenizer(_, encode) =>
        text => org.apache.spark.sql.functions.aggregate(
          org.apache.spark.sql.functions.transform(
            encode(org.apache.spark.sql.functions.coalesce(text,
              org.apache.spark.sql.functions.lit(""))),
            w => org.apache.spark.sql.functions.size(
              org.apache.spark.sql.functions.split(w, " "))
              .cast("long")),
          org.apache.spark.sql.functions.lit(0L), (acc, x) => acc + x)
      case UnigramTokenizer(family, _, _, _) =>
        throw new IllegalArgumentException(
          s"a $family tokenizer segments on the distinct-word domain " +
            "(unigramSegment) — join its per-word piece counts back " +
            "instead of counting per row (tokenBudgets dispatches " +
            "this for you)")
    }

  /** REAL per-document token budgets under ANY loaded tokenizer — the
    * one-call dispatch over [[tokenCounter]]'s honest refusal: a
    * column-encoder family counts per row (one codegen'd projection);
    * a Unigram family runs [[TextOps.unigramTokenCounts]] — the
    * distinct-word DP ONCE, per-word piece counts joined back through
    * the tokenizer's OWN `preTokens` word-domain builder (declared
    * normalizer and Metaspace split included), so budgets match what
    * [[TextOps.unigramSegment]] would emit. Returns (idCol, n_words,
    * n_tokens); feed `n_tokens` to the packers via the pre-joined
    * `countWith` column trick ([[unigramTokenCounts]]'s contract) —
    * [[graft.pipeline.Pipelines.exportTrainingShards]] wires exactly
    * that, so `--tokenizer any-file` just works end to end. */
  def tokenBudgets(lt: LoadedTokenizer, docs: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxLen: Int = 12, maxPiece: Int = 4): DataFrame =
    lt match {
      case ct @ ColumnTokenizer(_, encode) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit, size}
        docs.filter(col(textCol).isNotNull)
          .select(col(idCol),
            size(encode(coalesce(col(textCol), lit(""))))
              .cast("long").as("n_words"),
            tokenCounter(ct)(col(textCol)).as("n_tokens"))
      case UnigramTokenizer(_, vocab, preTokens, specials) =>
        val base = TextOps.unigramTokenCounts(docs, vocab, idCol,
          textCol, maxLen, maxPiece, preTokens)
        if (specials.isEmpty) base
        else {
          // added tokens never reach the word domain (preTokens
          // blanks them — loadTokenizer's carried contract); each
          // occurrence is exactly ONE token and ONE pre-token, counted
          // per row with the SAME fence regex the extraction uses
          import org.apache.spark.sql.functions.col
          val spc = addedTokensCount(specials)
          val sp = docs.filter(col(textCol).isNotNull)
            .select(col(idCol), spc(col(textCol)).as("n_specials"))
          base.join(sp, idCol)
            .select(col(idCol),
              (col("n_words") + col("n_specials")).as("n_words"),
              (col("n_tokens") + col("n_specials")).as("n_tokens"))
        }
    }

  /** ONE call from any shipped tokenizer file to a usable encoder —
    * the "a user can point the engine at their tokenizer" entry:
    *
    *  - `merges.txt` → byte-level BPE (that line format is the GPT-2
    *    distribution's);
    *  - `tokenizer.json` → by `model.type`: BPE routes through the
    *    declared pre_tokenizer (byte_level / whitespace), WordPiece
    *    through BERT basic tokenization, Unigram returns its scored
    *    vocab for the segmenter;
    *  - `vocab.txt` → WordPiece (BERT's distribution format);
    *  - `.model` → by `trainer_spec.model_type`: UNIGRAM returns the
    *    scored vocab; anything else fails descriptively (a BPE-typed
    *    .model ships no merge ranks we can apply).
    *
    * Tables ride broadcasts (one ship per executor); unknown formats
    * and mismatched dispatches fail with the file named. */
  def loadTokenizer(spark: SparkSession, path: String,
      unk: String = "[UNK]", maxChars: Int = 100): LoadedTokenizer = {
    if (path.endsWith("vocab.txt")) {
      val bc = wordpieceVocabBroadcastFromFile(spark, path, unk, maxChars)
      ColumnTokenizer("wordpiece", c => TextOps.wordpieceEncode(c, bc))
    } else if (path.endsWith(".json")) {
      // the file's declared normalizer chain composes in FRONT of
      // every family's encoder (the tokenizers pipeline order:
      // normalize, then pre-tokenize, then model) — SentencePiece
      // files default to NFKC, BERT ones declare BertNormalizer, and
      // skipping the declaration would encode accented/full-width
      // text differently than the shipping stack does
      val normRules = readNormalizerRules(spark, path)
      val norm = normalizerTransformRules(normRules)
      // the file's added_tokens EXTRACT before the model (and, for
      // the default normalized:false entries, before normalization —
      // the AddedVocabulary split-then-normalize order); an entry
      // declaring normalized:true next to a declared normalizer is a
      // different pipeline — fail by name rather than fake it
      val addedToks = readAddedTokens(spark, path)
      addedToks.filter(_.normalized).foreach { at =>
        require(normRules.isEmpty,
          s"$path: added token '${at.content}' declares " +
            "normalized=true beside a declared normalizer — " +
            "extraction after normalization is not supported")
      }
      val addedContents = addedToks.map(_.content)
      val base: LoadedTokenizer = readModelType(spark, path) match {
        case "BPE" =>
          val bc = mergesBroadcastFromFile(spark, path)
          // the file's declared byte_fallback (the Llama convention):
          // symbols outside model.vocab rewrite to their UTF-8 bytes'
          // <0xXX> piece spellings — the piece stream a real
          // byte_fallback tokenizer emits, so budget counting prices
          // OOV text byte-accurately and nothing is unk
          val bfNode = Option(tokenizerModel(spark, path)
            .get("byte_fallback")).filter(_.isBoolean)
            .exists(_.asBoolean())
          val bfWrap: org.apache.spark.sql.Column =>
              org.apache.spark.sql.Column =
            if (!bfNode) identity
            else {
              val bcV = vocabBroadcastFromFile(spark, path)
              enc => org.apache.spark.sql.functions.transform(enc,
                w => graft.functions.VectorExpressions
                  .byteFallbackSymbols(w, bcV))
            }
          readPreTokenizerKind(spark, path) match {
            case "byte_level" => ColumnTokenizer("bpe_byte_level",
              c => bfWrap(TextOps.bpeEncodeByteLevel(norm(c), bc)))
            case "metaspace" =>
              // the Llama/Mistral family: the file's own replacement
              // char and prepend scheme drive the split
              val (repl, scheme) = readMetaspaceConfig(spark, path)
              ColumnTokenizer("bpe_metaspace",
                c => bfWrap(TextOps.bpeEncodeMetaspace(norm(c), bc,
                  repl, scheme)))
            case "whitespace" => ColumnTokenizer("bpe_whitespace",
              c => bfWrap(TextOps.bpeEncodeKernel(norm(c), bc)))
            case other => throw new IllegalArgumentException(
              s"$path: BPE model with unsupported pre-tokenizer '$other'")
          }
        case "WordPiece" =>
          // the file's OWN declarations beat the call-site defaults:
          // a WordPiece distribution declaring unk_token "<unk>" must
          // not be forced through "[UNK]" (build would reject it), and
          // a declared max_input_chars_per_word changes which words
          // collapse to unk
          val model = tokenizerModel(spark, path)
          val declaredUnk = Option(model.get("unk_token"))
            .filter(_.isTextual).map(_.asText()).getOrElse(unk)
          val declaredMax = Option(model.get("max_input_chars_per_word"))
            .filter(_.isInt).map(_.asInt()).getOrElse(maxChars)
          readPreTokenizerKind(spark, path) match {
            // absent/Whitespace declarations route through BERT basic
            // tokenization too — a finer split (punctuation isolated),
            // which is how WordPiece vocab files are actually shipped;
            // the divergence shows only on punctuation-glued tokens
            case "bert" | "whitespace" =>
            case other => throw new IllegalArgumentException(
              s"$path: WordPiece model with unsupported " +
                s"pre-tokenizer '$other'")
          }
          val bc = wordpieceVocabBroadcastFromFile(spark, path,
            declaredUnk, declaredMax)
          ColumnTokenizer("wordpiece",
            c => TextOps.wordpieceEncode(norm(c), bc))
        case "Unigram" =>
          import spark.implicits._
          val vocab = tokenizerModel(spark, path).get("vocab")
          require(vocab != null && vocab.isArray,
            s"$path: Unigram model.vocab must be an array of " +
              "[piece, score] pairs")
          val rows = Vector.newBuilder[(String, Double)]
          val it = vocab.elements()
          while (it.hasNext) {
            val e = it.next()
            require(e.isArray && e.size() == 2,
              s"$path: Unigram vocab entry is not [piece, score]")
            rows += ((e.get(0).asText(), e.get(1).asDouble()))
          }
          val vocabDf = rows.result().toDF("piece", "lnp")
          readPreTokenizerKind(spark, path) match {
            // a T5-style file: the segmenter's word domain is the
            // ▁-form pieces under the file's own replacement/scheme
            case "metaspace" =>
              val (repl, scheme) = readMetaspaceConfig(spark, path)
              UnigramTokenizer("unigram", vocabDf,
                c => TextOps.metaspacePreTokens(norm(c), repl, scheme))
            case _ => UnigramTokenizer("unigram", vocabDf,
              c => defaultUnigramPreTokens(norm(c)))
          }
        case other => throw new IllegalArgumentException(
          s"$path: unsupported model.type '$other'")
      }
      if (addedContents.isEmpty) base
      else base match {
        case ct: ColumnTokenizer => ColumnTokenizer(ct.family,
          addedTokensEncode(addedContents, ct.encode))
        case ut: UnigramTokenizer =>
          // the word DOMAIN must not see control markup: the fence
          // regex blanks every occurrence before the domain builder
          // (▁<s>-style pollution would segment to nothing and
          // silently drop); per-row budget counting re-adds the
          // occurrences through the carried `specials`
          UnigramTokenizer(ut.family, ut.vocab,
            c => ut.preTokens(stripAddedTokens(addedContents)(c)),
            specials = addedContents)
      }
    } else if (path.endsWith(".model")) {
      val mt = readSentencePieceModelType(spark, path)
      require(mt == 1,
        s"$path: sentencepiece model_type $mt is not UNIGRAM(1) — " +
          "a .model ships piece scores, not applicable merge ranks")
      // the file's own normalizer_spec (nmt_nfkc by trainer default)
      // composes in front of the word-domain builder, exactly as the
      // tokenizer.json route composes its declared normalizer — the
      // two distribution formats of the same model must encode alike
      val norm = normalizerTransform(sentencePieceNormalizerKinds(
        readSentencePieceNormalizerName(spark, path), path))
      UnigramTokenizer("unigram", sentencePieceVocab(spark, path),
        c => defaultUnigramPreTokens(norm(c)))
    } else if (path.endsWith(".txt")) {
      // a .txt not literally named vocab.txt is AMBIGUOUS — WordPiece
      // vocabs ship as e.g. bert_vocab_v2.txt too. Sniff the first
      // non-empty line: merges.txt lines hold 'lhs rhs' (one interior
      // space) or the '#version' header; vocab.txt lines are single
      // tokens (spaces rejected by the format)
      val first = openLines(spark, path)
        .map(_.stripSuffix("\r")).find(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          s"$path: empty file — neither merges.txt nor vocab.txt"))
      if (first.startsWith("#version") || first.contains(' ')) {
        val bc = mergesBroadcastFromFile(spark, path)
        ColumnTokenizer("bpe_byte_level",
          c => TextOps.bpeEncodeByteLevel(c, bc))
      } else {
        val bc = wordpieceVocabBroadcastFromFile(spark, path, unk,
          maxChars)
        ColumnTokenizer("wordpiece", c => TextOps.wordpieceEncode(c, bc))
      }
    } else throw new IllegalArgumentException(
      s"$path: unrecognized tokenizer file format (expected " +
        "merges.txt, tokenizer.json, vocab.txt, or .model)")
  }

  /** One-call path from a merges file to the kernel's broadcast handle:
    * `merges.txt` and `tokenizer.json` are auto-detected by suffix
    * (override by calling the specific reader + broadcast yourself).
    * Feed the result to [[TextOps.bpeEncodeKernel]] /
    * [[TextOps.bpeEncodeWordKernel]]. */
  def mergesBroadcastFromFile(spark: SparkSession, path: String)
      : org.apache.spark.broadcast.Broadcast[
        graft.functions.BpeEncodeWord.Merges] = {
    val merges =
      if (path.endsWith(".json")) readTokenizerJsonMerges(spark, path)
      else readMergesTxt(spark, path)
    TextOps.bpeMergesBroadcast(spark, merges)
  }
}
