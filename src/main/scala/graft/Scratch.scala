package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch profiler (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rep(table: String, times: Int, idCol: String): DataFrame = {
      val b = spark.read.parquet(s"$sfDir/$table.parquet")
      (0 until times).map(r => b.withColumn(idCol,
        col(idCol) + lit(r * 1000000000L))).reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
    }
    val probes: Seq[(String, () => Long)] = Seq(
      "md5_fanout" -> (() =>
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"))
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            explode(sequence(lit(1), lit(8000))).as("i"))
          .select(graft.functions.HashExpressions.md5Prefix(
            concat(col("doc_id").cast("string"), lit(":"),
              col("i").cast("string")), 15).as("h"))
          .agg(bit_xor(col("h"))).collect().length.toLong),
      "jaro_fanout" -> (() =>
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("text"),
            explode(sequence(lit(1), lit(50))).as("i"))
          .select(graft.functions.HashExpressions.jaroWinkler(
            col("text"), concat(col("i").cast("string"), col("text")))
            .as("s"))
          .agg(sum("s")).collect().length.toLong),
      "dot_fanout" -> (() =>
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("embedding").cast("array<double>").as("v"),
            explode(sequence(lit(1), lit(2000))).as("i"))
          .select(graft.functions.VectorExpressions.dotProduct(
            col("v"), col("v")).as("d"))
          .agg(sum("d")).collect().length.toLong))
    probes.foreach { case (_, f) => f(); () } // warmup
    (1 to 2).foreach { _ =>
      probes.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f()
        println(f"[scratch] cpus=$cpus $n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
