package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Skew utilities + SQL registration of custom expressions. */
class SkewAndSqlSpec extends SparkSpec {
  import spark.implicits._

  test("twoPhaseAgg matches a plain groupBy count under skew") {
    val df = (Seq.fill(1000)("hot") ++ Seq("a", "b", "b")).zipWithIndex
      .toDF("k", "id")
    val got = Skew.twoPhaseAgg(df, Seq("k"), col("id"), 16,
      partial = count(lit(1)), finalAgg = sum(col("_partial")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 1000L, "a" -> 1L, "b" -> 2L))
  }

  test("saltedJoin equals the plain join result") {
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("c", 9)))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("k", "v", "id")
    val right = Seq(("hot", 10.0), ("a", 20.0), ("b", 30.0)).toDF("k", "w")
    val plain = left.join(right, Seq("k")).agg(
      count(lit(1)), sum($"v" * $"w")).head()
    val salted = Skew.saltedJoin(left, right, Seq("k"), col("id"), 8)
      .agg(count(lit(1)), sum($"v" * $"w")).head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getDouble(1) == salted.getDouble(1))
  }

  test("dot_product is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("frequent_items aggregates from SQL with the default and explicit " +
    "map size") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b", "a").toDF("w").createOrReplaceTempView("fi_words")
    val r = spark.sql(
      "SELECT frequent_items(w) AS fi FROM fi_words").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getString(0), x.getLong(1))) ==
      Seq(("a", 3L), ("b", 1L)))
    val r2 = spark.sql(
      "SELECT frequent_items(w, 64) AS fi FROM fi_words").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(r2.map(x => (x.getString(0), x.getLong(1))) ==
      Seq(("a", 3L), ("b", 1L)))
  }

  test("composed text functions are callable from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT quality_score('the quick brown fox is on the mat') AS q,
        |       lang_id_en('the quick brown fox is on the mat') AS l,
        |       hash_split(42) AS s,
        |       dup_ngram_fraction('a b a b a', 2) AS r""".stripMargin)
      .head()
    assert(row.getDouble(0) > 0 && row.getDouble(0) <= 1.0)
    assert(row.getString(1) == "en")
    assert(Set("train", "val", "test")(row.getString(2)))
    assert(row.getDouble(3) == 0.5)
    // SQL and Column API must agree exactly
    import org.apache.spark.sql.functions._
    val api = Seq("a b a b a").toDF("t")
      .select(graft.text.TextOps.duplicateNgramFraction(col("t"), 2))
      .head().getDouble(0)
    assert(api == row.getDouble(3))
  }

  test("SQL functions over column references match the Column API") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox is on the mat and the dog is here"),
      (2L, "xyzzy plugh zork grue"),
      (3L, "a b a b a b a b"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sql_surface_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, quality_score(text) AS q, lang_id_en(text) AS l,
        |       hash_split(doc_id) AS s, dup_ngram_fraction(text, 2) AS r,
        |       token_entropy(text) AS e,
        |       jaro_winkler(text, 'the quick brown fox') AS j
        |FROM sql_surface_docs ORDER BY doc_id""".stripMargin).collect()
    val viaApi = docs.select($"doc_id",
      graft.text.TextOps.qualityScore($"text").as("q"),
      graft.text.TextOps.langIdEn($"text").as("l"),
      graft.text.TextOps.hashSplit($"doc_id").as("s"),
      graft.text.TextOps.duplicateNgramFraction($"text", 2).as("r"),
      graft.text.TextOps.tokenEntropy($"text").as("e"),
      graft.functions.HashExpressions.jaroWinkler($"text",
        lit("the quick brown fox")).as("j"))
      .orderBy($"doc_id").collect()
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("round-9 SQL surface: deflate_ratio, normalize_url, " +
    "registered_domain (heuristic/psl/custom), html_extract ≡ Column API") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT deflate_ratio('spam mail spam mail spam mail') AS d,
        |  normalize_url('HTTPS://Ex.COM:443/a//b/?utm_source=x&id=1#f') AS u,
        |  normalize_url('https://ex.com/a?ref=main&id=1', 'ref') AS u2,
        |  registered_domain('files.acme.co.uk') AS rh,
        |  registered_domain('blog.example.or.jp', 'psl') AS rp,
        |  registered_domain('a.b.or.jp', 'or.jp') AS rc,
        |  html_extract('<p>fish &amp; chips</p><!-- c -->') AS h""".stripMargin)
      .head()
    // each equals its Column-API twin (one source of truth)
    import graft.text.{TextOps, UrlOps}
    def api(c: org.apache.spark.sql.Column): String =
      Seq(1).toDF("i").select(c.cast("string")).head().getString(0)
    assert(row.getDouble(0) ==
      api(TextOps.compressionRatio(
        lit("spam mail spam mail spam mail"))).toDouble)
    assert(row.getString(1) == "https://ex.com/a/b?id=1")
    assert(row.getString(2) == "https://ex.com/a?id=1")
    assert(row.getString(3) == "acme.co.uk")
    assert(row.getString(4) == "example.or.jp")
    assert(row.getString(5) == "b.or.jp")
    assert(row.getString(6) == "fish & chips")
  }

  test("detect_license and blocklist_fraction ≡ Column API from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT detect_license('Released under the MIT License') AS l,
        |  detect_license('nothing notable') AS lu,
        |  blocklist_fraction('bad word bad', 'bad') AS f,
        |  blocklist_fraction('all clean', 'bad, worse') AS f0""".stripMargin)
      .head()
    assert(row.getString(0) == "mit")
    assert(row.getString(1) == "unknown")
    assert(row.getDouble(2) == 2.0 / 3)
    assert(row.getDouble(3) == 0.0)
    // the SQL fraction is the same expression blocklistStats builds
    import graft.text.TextOps
    val api = Seq("bad word bad").toDF("text")
      .select(TextOps.blocklistFraction(col("text"), Seq("bad")))
      .head().getDouble(0)
    assert(row.getDouble(2) == api)
  }

  test("normalize_text and bpe_encode ≡ Column API from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT normalize_text('“hi”  there x') AS n, " +
        "bpe_encode('there', 't h,th e') AS b").head()
    assert(row.getString(0) == "\"hi\" there x")
    assert(row.getString(1) == "the r e")
    import graft.text.TextOps
    val api = Seq("“hi”  there x").toDF("t")
      .select(TextOps.normalizeText(col("t"))).head().getString(0)
    assert(row.getString(0) == api)
  }

  test("luhn_valid, render_chat and fim_text ≡ Column API from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT luhn_valid('4532015112830366') AS l1, " +
        "luhn_valid('4532015112830367') AS l2, " +
        "render_chat(array(struct('user' AS role, 'hi' AS content), " +
        "struct('assistant' AS role, 'yo' AS content))) AS r, " +
        "fim_text(7, 'some document text here', 100) AS f, " +
        "fim_text(7, 'some document text here', 0) AS f0").head()
    assert(row.getBoolean(0) && !row.getBoolean(1))
    assert(row.getString(2) == "<|user|>hi<|assistant|>yo")
    // rate 100 transforms, rate 0 passes through — and the transformed
    // form matches the Column API bit-for-bit
    import graft.text.TextOps
    val api = Seq((7L, "some document text here")).toDF("id", "t")
      .select(TextOps.fimText(col("id"), col("t"), 100)).head()
      .getString(0)
    assert(row.getString(3) == api)
    assert(row.getString(3).startsWith("<|fim_prefix|>"))
    assert(row.getString(4) == "some document text here")
  }

  test("unicode_normalize, bleu_stats and morton_key ≡ Column API " +
    "from SQL; form defaults to NFC") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT unicode_normalize('café') AS n1, " +
        "unicode_normalize('ﬁle', 'NFKC') AS n2, " +
        "bleu_stats('the cat sat', 'the the cat')[0].o AS o1, " +
        "morton_key(5, 3, 3) AS z, morton_key(5, 3) AS z16").head()
    assert(row.getString(0) == "café")
    assert(row.getString(1) == "file")
    // clipped unigram overlap: 'the' clips to 1, 'cat' matches -> 2
    assert(row.getLong(2) == 2L)
    assert(row.getLong(3) == 27L)
    import graft.text.TextOps
    val api = Seq(("café", 5L, 3L)).toDF("t", "a", "b")
      .select(TextOps.nfcNormalize(col("t")).as("n"),
        graft.ops.Layout.mortonKey(Seq(col("a"), col("b")), 16).as("z"))
      .head()
    assert(row.getString(0) == api.getString(0) &&
      row.getLong(4) == api.getLong(1))
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").head()
    }
    // html_meta: the whole struct from SQL
    val hm = spark.sql("SELECT html_meta('<head><title>T</title>" +
      "<link rel=\"canonical\" href=\"https://a/x\"></head>') AS m")
      .select("m.title", "m.canonical").head()
    assert(hm.getString(0) == "T" && hm.getString(1) == "https://a/x")
    // round-15 surface: entity decode + packed Hamming from SQL
    val r15 = spark.sql(
      "SELECT xml_unescape('a=1&amp;b=&#47;x') AS u, " +
        "hamming_dist(array(5L, 0L), array(6L, 1L)) AS h, " +
        "fix_mojibake('cafÃ©') AS m").head()
    assert(r15.getString(0) == "a=1&b=/x")
    // 5 xor 6 = 3 (two bits), 0 xor 1 = 1 (one bit)
    assert(r15.getLong(1) == 3L)
    assert(r15.getString(2) == "café")
  }

  test("SQL optional arguments are honored and bad arity is rejected") {
    GraftFunctions.register(spark)
    // hash_split(key, 100, 0): every key must land in 'train'
    val splits = spark.sql(
      "SELECT hash_split(id, 100, 0) AS s FROM range(0, 200)")
      .collect().map(_.getString(0)).toSet
    assert(splits == Set("train"))
    // lang_id_en threshold 1.0: ordinary English text no longer passes.
    // Plain decimal spelling (no 'd' suffix) parses as a DecimalType
    // literal and must be accepted too
    for (litSpelling <- Seq("1.0d", "1.0")) {
      val strict = spark.sql(
        s"SELECT lang_id_en('the quick brown fox is on the mat', $litSpelling) AS l")
        .head().getString(0)
      assert(strict == "other", s"literal $litSpelling")
    }
    // wrong arity fails with a message naming the function, not a raw
    // collection exception
    val err = intercept[Exception] {
      spark.sql("SELECT quality_score('a', 'b')").collect()
    }
    assert(err.getMessage.contains("quality_score"))
  }

  test("interval algebra is reachable from SQL as table functions") {
    GraftFunctions.register(spark)
    // overlapping/nested/touching intervals across two keys
    Seq(
      ("u1", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      ("u1", ts("2024-01-01 00:30:00"), ts("2024-01-01 02:00:00")),
      ("u1", ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")),
      ("u2", ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00")))
      .toDF("user_id", "start_time", "end_time")
      .createOrReplaceTempView("iv_base")
    Seq(
      ("u1", ts("2024-01-01 00:45:00"), ts("2024-01-01 01:15:00")),
      ("u2", ts("2024-01-01 05:30:00"), ts("2024-01-01 05:40:00")))
      .toDF("user_id", "start_time", "end_time")
      .createOrReplaceTempView("iv_sub")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "start_time", "end_time").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString)).sorted.toSeq

    val mergeSql = spark.sql(
      "SELECT * FROM graft_merge_intervals('iv_base', 'user_id')")
    assert(canon(mergeSql) == canon(graft.ops.Windows.mergeIntervals(
      spark.table("iv_base"), Seq("user_id"))))
    assert(canon(mergeSql).count(_._1 == "u1") == 2) // [0,2h] + [3h,4h]

    val subSql = spark.sql(
      "SELECT * FROM graft_subtract_intervals('iv_base', 'iv_sub', 'user_id')")
    assert(canon(subSql) == canon(graft.ops.Intervals.subtractIntervals(
      spark.table("iv_base"), spark.table("iv_sub"), Seq("user_id"))))

    val interSql = spark.sql(
      "SELECT * FROM graft_intersect_intervals('iv_base', 'iv_sub', 'user_id')")
    assert(canon(interSql) == canon(graft.ops.Intervals.intersectIntervals(
      spark.table("iv_base"), spark.table("iv_sub"), Seq("user_id"))))
    // u1's intersection is exactly the sub interval (nested in base)
    assert(canon(interSql).filter(_._1 == "u1") == Seq(
      ("u1", "2024-01-01 00:45:00.0", "2024-01-01 01:15:00.0")))

    val covSql = spark.sql(
      "SELECT * FROM graft_interval_coverage('iv_base', 'user_id')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1: merged [0,2h] + [3h,4h] = 3h; u2: 1h (in microseconds)
    assert(covSql == Map("u1" -> 3L * 3600000000L,
      "u2" -> 1L * 3600000000L))
    // un-keyed (global) coverage: one row
    val covAll = spark.sql(
      "SELECT * FROM graft_interval_coverage('iv_base')").head().getLong(0)
    assert(covAll == 4L * 3600000000L)
  }

  test("functions install via SparkSessionExtensions (injectFunction path)") {
    // build a sibling session on the shared SparkContext with the
    // extensions applied at construction — the production install path
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSession = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = extSession.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "lang_id_en('the quick brown fox is on the mat') AS l")
        .head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getString(1) == "en")
      // table functions install through the same extensions object
      extSession.sql(
        "SELECT timestamp'2024-01-01 00:00:00' AS start_time, " +
          "timestamp'2024-01-01 01:00:00' AS end_time " +
        "UNION ALL SELECT timestamp'2024-01-01 00:30:00', " +
          "timestamp'2024-01-01 02:00:00'")
        .createOrReplaceTempView("ext_iv")
      val merged = extSession.sql(
        "SELECT * FROM graft_merge_intervals('ext_iv')").collect()
      assert(merged.length == 1)
      assert(merged.head.getTimestamp(1).toString == "2024-01-01 02:00:00.0")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
