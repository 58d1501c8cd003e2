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
  }
}

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, catalystExpression}

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private[graft] val builders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", classOf[DotProduct].getName,
      exprs => DotProduct(exprs(0), exprs(1))),
    ("word_shingles", classOf[WordShingles].getName,
      exprs => WordShingles(exprs(0), intLit(exprs(1), "word_shingles"))),
    ("minhash_sig", classOf[MinHashSignature].getName,
      exprs => MinHashSignature(exprs(0), intLit(exprs(1), "minhash_sig"))),
    ("simhash64", classOf[SimHash64].getName,
      exprs => SimHash64(exprs(0))),
    // composed text-curation functions: builders expand to the same
    // Column compositions the Scala API uses (one source of truth)
    ("quality_score", graft.text.TextOps.getClass.getName,
      exprs => colFn(exprs, graft.text.TextOps.qualityScore)),
    ("lang_id_en", graft.text.TextOps.getClass.getName,
      exprs => colFn(exprs, graft.text.TextOps.langIdEn(_))),
    ("hash_split", graft.text.TextOps.getClass.getName,
      exprs => colFn(exprs, graft.text.TextOps.hashSplit(_))),
    ("dup_ngram_fraction", graft.text.TextOps.getClass.getName,
      exprs => catalystExpression(graft.text.TextOps.duplicateNgramFraction(
        column(exprs(0)), intLit(exprs(1), "dup_ngram_fraction")))))

  private def colFn(exprs: Seq[Expression],
                    fn: org.apache.spark.sql.Column =>
                      org.apache.spark.sql.Column): Expression =
    catalystExpression(fn(column(exprs.head)))

  /** Runtime registration (temp functions) for an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
