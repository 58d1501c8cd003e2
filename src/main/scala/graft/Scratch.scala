package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch profiler (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Skew

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })

    def run(label: String)(df: => DataFrame): Unit = {
      jobs = 0
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(50)
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"jobs=$jobs")
    }

    val li = io.Readers.table(spark, sfDir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val ord = io.Readers.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))

    def agg(j: DataFrame) = j.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 4).as("sum_price"))
      .orderBy("o_orderpriority")

    def current = agg(Skew.saltedJoin(li, ord, Seq("o_orderkey"),
      col("l_linenumber"), buckets = 8))

    def variant(hint: String) = {
      val l = li.withColumn("_salt",
        pmod(hash(col("l_linenumber")), lit(8)))
      // NOTE: approximating saltOf — only for shape timing, not parity
      val r = ord.withColumn("_salt",
        explode(sequence(lit(0), lit(7)))).hint(hint)
      agg(l.join(r, Seq("o_orderkey", "_salt")).drop("_salt"))
    }

    (1 to 3).foreach { _ =>
      run("current-broadcast")(current)
      run("shuffle-hash")(variant("shuffle_hash"))
      run("merge")(variant("merge"))
    }
    spark.stop()
  }
}
