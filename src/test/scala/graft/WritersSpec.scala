package graft

import java.nio.file.Files
import graft.io.Writers

/** Sinks: plain, date-partitioned layout, idempotence guard. */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("partitionedParquet writes partition directories; reads prune by key") {
    val dir = Files.createTempDirectory("graft_w").resolve("out").toString
    val df = Seq(("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3))
      .toDF("date", "v")
    Writers.partitionedParquet(df, dir, Seq("date"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val oneDay = back.filter($"date" === "2024-01-01")
    assert(oneDay.count() == 2)
    // partition pruning: the filter must land in the scan's
    // PartitionFilters (directory-level pruning), not a post-scan Filter
    val plan = oneDay.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*date".r.findFirstIn(plan).isDefined,
      s"date filter not pruning partitions:\n$plan")
    assert(new java.io.File(dir, "date=2024-01-02").exists)
  }

  test("parquetIfAbsent is a no-op when output exists (S8)") {
    val dir = Files.createTempDirectory("graft_w2").resolve("out").toString
    Writers.parquetIfAbsent(Seq(1, 2, 3).toDF("v"), dir)
    Writers.parquetIfAbsent(Seq(9).toDF("v"), dir) // ignored
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("bucketedTable join on the bucket key plans without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0L until 200L).map(i => (i % 40, i)).toDF("k", "a")
      val dims = (0L until 40L).map(i => (i, i * 10)).toDF("k", "b")
      Writers.bucketedTable(facts, "bt_facts", Seq("k"), 4,
        sortCols = Seq("k"))
      Writers.bucketedTable(dims, "bt_dims", Seq("k"), 4, sortCols = Seq("k"))
      val joined = spark.table("bt_facts")
        .join(spark.table("bt_dims"), "k")
      val p = joined.queryExecution.sparkPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bt_facts")
      spark.sql("DROP TABLE IF EXISTS bt_dims")
    }
  }
}
