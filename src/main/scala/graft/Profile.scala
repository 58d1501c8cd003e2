package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev measurement harness (guide §1: measure first): runs named queries
  * once after a warmup pass and prints per-query wall seconds, job count,
  * stage count, task count and shuffle bytes — the fixed-overhead
  * profile that explains sf0.1 seconds (at 17 MB of input, per-query
  * cost is job/stage/barrier count, not bytes). Not part of the driver
  * contract; `Bench` stays the reported number.
  *
  * Usage: runMain graft.Profile <sfDir> <q1,q2,...|topN>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics
          .bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def runOne(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup (codegen)
      spark.catalog.clearCache()
      Thread.sleep(50) // let listener events drain
      jobs = 0; stages = 0; tasks = 0L; shuffleWrite = 0L
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(100)
      println(f"[profile] $name%-28s ${dt}%7.3f s  jobs=$jobs%3d " +
        f"stages=$stages%3d tasks=$tasks%5d shufKB=${shuffleWrite / 1024}%7d")
    }
    names.foreach { n =>
      try runOne(n)
      catch { case e: Throwable =>
        println(s"[profile] $n FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
