package graft

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
}
