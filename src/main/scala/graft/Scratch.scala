package graft

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

    def time(label: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[scratch] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    val sh = docs.select(col("doc_id").as("id"),
      TextOps.shingles(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    def inv = sh.select(col("id"), col("n_sh"),
        explode(col("sh")).as("shingle"))
      .select(col("id"), col("n_sh"), xxhash64(col("shingle")).as("sh_h"))

    def finish(pairs: DataFrame): Long =
      pairs
        .select(col("_a.id").as("id_a"), col("_a.n_sh").as("n_a"),
          col("_b.id").as("id_b"), col("_b.n_sh").as("n_b"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= 0.1)
        .count()

    def expand(groups: DataFrame): DataFrame =
      groups.repartition(spark.sparkContext.defaultParallelism)
        .select(col("ms").as("_ms"), posexplode(col("ms")).as(Seq("_i", "_a")))
        .select(col("_a"), explode(slice(col("_ms"), col("_i") + 2,
          size(col("_ms")) - col("_i") - 1)).as("_b"))

    // V0: r17 unbounded single collect
    time("V0-unbounded-collect") {
      val groups = inv.groupBy("sh_h")
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("ms"))
        .filter(size(col("ms")) >= 2)
        .select(array_sort(col("ms")).as("ms"))
      finish(expand(groups))
    }
    // V2: separate-lineage hot keys, broadcast anti/semi split
    time("V2-hotkeys-anti-semi") {
      val lim = 4096
      val hotKeys = inv.groupBy("sh_h").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > lim).select("sh_h")
      val smallGroups = inv.join(broadcast(hotKeys), Seq("sh_h"), "left_anti")
        .groupBy("sh_h")
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("ms"))
        .filter(size(col("ms")) >= 2)
        .select(array_sort(col("ms")).as("ms"))
      val hot = inv.join(broadcast(hotKeys), Seq("sh_h"), "left_semi")
        .select(col("sh_h"), struct(col("id"), col("n_sh")).as("m"))
      val hotPairs = hot.select(col("sh_h"), col("m").as("_a"))
        .join(hot.select(col("sh_h"), col("m").as("_b")), Seq("sh_h"))
        .select(col("_a"), col("_b"))
      finish(expand(smallGroups).unionByName(hotPairs))
    }
    // V3: bare self-join (the verdict's option a)
    time("V3-bare-self-join") {
      val a = inv.select(col("sh_h"), struct(col("id"), col("n_sh")).as("_a"))
      val b = inv.select(col("sh_h"), struct(col("id"), col("n_sh")).as("_b"))
      finish(a.join(b, Seq("sh_h")).select(col("_a"), col("_b")))
    }
    spark.stop()
  }
}
