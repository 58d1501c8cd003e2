package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev scratch profiler (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)
        println(f"[stage] ${i.stageId}%3d ${ms}%5d ms tasks=${i.numTasks}%3d " +
          i.name.take(90))
      }
    })

    val fn = SparkEntry.queries("q208_winnowing_overlap")
    fn(spark, sfDir).count() // warmup
    spark.catalog.clearCache()
    println("[scratch] ---- measured run ----")
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"[scratch] q208 total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
