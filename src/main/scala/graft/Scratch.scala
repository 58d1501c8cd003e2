package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch profiler (not part of the engine surface): times one
  * query end-to-end in a fresh session. Edit freely while profiling
  * (r17 used it to decompose q231's gate-pushdown re-evaluation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextOps
    val docs = io.Readers.table(spark, sfDir, "documents")

    @volatile var shuffleWrite = 0L
    @volatile var stages = 0
    @volatile var jobs = 0
    @volatile var tasks = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleWrite +=
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    def run(label: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      shuffleWrite = 0L; stages = 0; jobs = 0; tasks = 0L
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(50)
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"jobs=$jobs stages=$stages tasks=$tasks shufKB=${shuffleWrite / 1024}")
      spark.catalog.clearCache()
    }

    // v0: current shape (battery evaluated by both consumers)
    def v0 = TextOps.selectUnderTokenBudget(docs, budgetTokens = 12000L)
      .orderBy("doc_id")

    // v1: persist the narrow scored frame, one battery pass
    def v1 = {
      val t = docs.select(col("doc_id"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .persist()
      val bins = t.groupBy("quality").agg(sum("n_tokens").as("_btok"))
      val wBins = org.apache.spark.sql.expressions.Window
        .orderBy(col("quality").desc)
      val offsets = bins
        .withColumn("_prior", sum("_btok").over(wBins) - col("_btok"))
        .filter(col("_prior") < 12000L)
        .select("quality", "_prior")
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("quality").orderBy(col("doc_id"))
      t.join(broadcast(offsets), Seq("quality"))
        .withColumn("cum_tokens",
          col("_prior") + sum("n_tokens").over(wDoc))
        .filter(col("cum_tokens") <= 12000L)
        .select(col("doc_id"), col("quality"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy("doc_id")
    }

    // v2: spread the corpus over cores before the battery, then persist
    def v2 = {
      val t = docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          round(TextOps.qualityScore(col("text")), 6).as("quality"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .persist()
      val bins = t.groupBy("quality").agg(sum("n_tokens").as("_btok"))
      val wBins = org.apache.spark.sql.expressions.Window
        .orderBy(col("quality").desc)
      val offsets = bins
        .withColumn("_prior", sum("_btok").over(wBins) - col("_btok"))
        .filter(col("_prior") < 12000L)
        .select("quality", "_prior")
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("quality").orderBy(col("doc_id"))
      t.join(broadcast(offsets), Seq("quality"))
        .withColumn("cum_tokens",
          col("_prior") + sum("n_tokens").over(wDoc))
        .filter(col("cum_tokens") <= 12000L)
        .select(col("doc_id"), col("quality"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy("doc_id")
    }

    (1 to 3).foreach { _ =>
      run("v0-current")(v0)
      run("v1-persist")(v1)
      run("v2-spread-persist")(v2)
    }
    spark.stop()
  }
}
