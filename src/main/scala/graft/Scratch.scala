package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch profiler (not part of the engine surface): times one
  * query end-to-end in a fresh session. Edit freely while profiling. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q231 decomposition: where does the time go?
    val docs = graft.io.Readers.table(spark, sfDir, "documents")
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PHASE $label#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("ntext"))
    def convs = {
      val words = filter(graft.text.TextOps.wsTokens(col("text")),
        w => length(w) > 0)
      val turns = filter(
        transform(sequence(lit(0), lit(3)), k =>
          struct(
            when(k % 2 === 0, lit("user")).otherwise(lit("assistant"))
              .as("role"),
            array_join(slice(words, k * 5 + 1, lit(5)), " ").as("content"))),
        x => length(x.getField("content")) > 0)
      docs.join(nxt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 6 === 0 && col("ntext").isNotNull,
            col("ntext")).otherwise(col("text")).as("text"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"), turns.as("turns"))
    }
    time("convs only")(convs.count())
    time("convs noop") {
      convs.write.format("noop").mode("overwrite").save(); -1L
    }
    val cur = graft.pipeline.Pipelines.curateChat(convs)
    time("full curateChat.sft")(cur.sft.count())
    time("full query")(SparkEntry.queries("q231_curate_chat")(spark, sfDir).count())
    spark.stop()
  }
}
