package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up session machinery (codegen, Janino, parquet committer,
    // window/HOF paths, scheduler) so the first measured query isn't
    // charged one-time init
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.groupBy("r_regionkey").count().count()
      val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      spark.range(100)
        .select(col("id"), sum("id").over(w).as("s"),
          md5(col("id").cast("string")).as("h"),
          transform(sequence(lit(0), lit(3)), i => i * 2).as("t"))
        .count()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators cache self-join inputs; release between queries so
      // storage memory doesn't accumulate across the run
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
