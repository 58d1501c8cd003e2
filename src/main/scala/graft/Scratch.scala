package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch profiler (not part of the engine surface): times one
  * query end-to-end in a fresh session. Edit freely while profiling
  * (r17 used it to decompose q231's gate-pushdown re-evaluation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q41_dedup_clusters")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
