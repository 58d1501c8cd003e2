package graft.io

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2.1, S5/S7/S8). Parquet-first; CSV kept for
  * compatibility with the reference's on-disk contract
  * (/root/reference/raw_data_reformat.py:93-103). */
object Writers {

  /** S5: plain sink. */
  def parquet(df: DataFrame, path: String,
              mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  def csv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** S7: date-partitioned layout — the native equivalent of the reference's
    * per-date directory shuffling (/root/reference/organize_raw_files.py:43-60).
    * Partition columns become directory keys → partition pruning at read. */
  def partitionedParquet(df: DataFrame, path: String,
                         cols: Seq[String],
                         mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** S8: idempotence guard — skip when output exists
    * (/root/reference/raw_data_reformat.py:246-264). */
  def parquetIfAbsent(df: DataFrame, path: String): Unit =
    df.write.mode("ignore").parquet(path)

  /** Bucketed (and optionally sort-bucketed) parquet table: rows are
    * hash-clustered into `buckets` files per partition on `bucketCols`.
    * Joins and aggregations keyed on the bucket columns then plan with NO
    * shuffle (Catalyst recognizes the bucketing as a satisfied
    * distribution) — at 100 TB this turns every fact⋈fact join on the
    * bucket key from a full-network shuffle into a local zip of bucket
    * files. Registered through the catalog because bucketing metadata
    * lives there, not in the parquet footers. */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
