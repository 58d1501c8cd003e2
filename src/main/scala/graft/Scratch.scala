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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        shuffleWrite +=
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    def run(label: String)(df: => DataFrame): Unit = {
      shuffleWrite = 0L; stages = 0; jobs = 0
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(50)
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"jobs=$jobs stages=$stages shufKB=${shuffleWrite / 1024}")
    }

    val termsA = Seq("spark", "window", "dup")
    val termsB = Seq("vector", "merge", "dup")

    def newShape = TextOps.rrfFuse(
      TextOps.bm25TopKRuns(docs, Seq(termsA, termsB), k = 20),
      rrfK = 60, topK = 25)
      .orderBy(col("rrf_score").desc, col("doc_id"))
    def singleRun = TextOps.bm25TopK(docs, termsA, k = 15)
      .orderBy(col("score").desc, col("doc_id"))

    (1 to 3).foreach { _ =>
      run("q146-shape")(newShape)
      run("q74-shape")(singleRun)
    }
    locally {
      val d = newShape
      d.collect()
      println("[scratch] ---- final adaptive plan (new) ----")
      println(d.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
