package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, count, length, lit, sum, xxhash64}

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

  /** ORC sink (engine extension): the second columnar interchange format
    * warehouses exchange beside parquet — Spark's native ORC writer, so
    * reads get the same predicate pushdown / column pruning / vectorized
    * scan machinery (PushedFilters shows up in the ORC scan exactly like
    * parquet; WritersSpec gates it). Supports the same partitioned
    * layout as [[partitionedParquet]] via `cols`. */
  def orc(df: DataFrame, path: String, cols: Seq[String] = Nil,
          mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (cols.nonEmpty) w.partitionBy(cols: _*) else w).orc(path)
  }

  /** JSON-Lines sink — the interchange format LLM corpora actually ship
    * as (one JSON object per line, optionally gzipped per part file).
    * Columnar formats beat it for analytics (no pushdown, no pruning,
    * full-row parse on read — keep parquet/ORC for pipeline-internal
    * hops); this is the EXPORT edge. gzip parts are non-splittable (the
    * WARC caveat): parallelism on re-read = part-file count, which this
    * writer controls via the upstream partition count. */
  def jsonl(df: DataFrame, path: String, gzip: Boolean = false,
            mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** TFRecord export edge — ready-to-train shards in the wire format
    * TensorFlow-family loaders stream ([[Tfrecord.writeTfrecordShards]]
    * does the encoding; this is the Writers-surface alias). Returns
    * the |shards|-row manifest. Like [[jsonl]], an EXPORT format: no
    * pushdown, no pruning — keep parquet for pipeline-internal hops. */
  def tfrecord(df: DataFrame, path: String): DataFrame =
    Tfrecord.writeTfrecordShards(df, path)

  /** Small-file compaction: rewrite a parquet directory into
    * ≈`targetFileMB`-sized files. Streaming sinks, per-batch ingests, and
    * over-parallel writers leave thousands of KB-scale files per
    * partition; at 100 TB that turns every scan into a metadata storm
    * (one task + one footer read per tiny file) and throttles the object
    * store. File count = ceil(bytes / target), via `repartition` — a full
    * shuffle, which is the point: coalesce would merely glue existing
    * partitions and skew output sizes. Optional `sortCols` cluster rows
    * within files so min/max footer stats prune at read (poor man's
    * Z-order). A `key=value`-partitioned tree is preserved: the rewrite
    * shuffles on the partition columns and writes back `partitionBy`, so
    * pruning survives compaction.
    *
    * Durability: the rewrite lands in a sibling tmp dir, then two renames
    * swap it in; both renames are CHECKED (Hadoop reports most failures
    * by returning false, not throwing) and a failed swap rolls the
    * original back. A crash between the renames leaves the data intact
    * under `.<name>_compact_old` — recoverable by a rename, never
    * deleted until the swap has fully succeeded. */
  def compact(spark: SparkSession, path: String,
              targetFileMB: Int = 512,
              sortCols: Seq[String] = Nil): Long = {
    require(targetFileMB > 0, s"targetFileMB must be > 0, got $targetFileMB")
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L, (bytes + targetFileMB.toLong * (1 << 20) - 1)
      / (targetFileMB.toLong * (1 << 20)))
    // hive-style partition dirs (date=2024-01-01/...) — walk one leaf
    // chain to recover the partition column names
    def partCols(p: Path, acc: Seq[String]): Seq[String] = {
      val sub = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath).find(_.getName.contains("="))
      sub match {
        case Some(d) => partCols(d, acc :+ d.getName.split("=", 2)(0))
        case None => acc
      }
    }
    val parts = partCols(hPath, Nil)
    val df0 = spark.read.parquet(path)
    val shuffleCols = (parts ++ sortCols).map(col)
    val df =
      if (shuffleCols.nonEmpty)
        df0.repartitionByRange(nFiles.toInt, shuffleCols: _*)
          .sortWithinPartitions(shuffleCols: _*)
      else df0.repartition(nFiles.toInt)
    val tmp = new Path(hPath.getParent, s".${hPath.getName}_compact_tmp")
    val w = df.write.mode("overwrite")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(tmp.toString)
    val bak = new Path(hPath.getParent, s".${hPath.getName}_compact_old")
    checkedSwap(fs, hPath, tmp, bak)
    nFiles
  }

  /** Atomic parquet PUBLISH: write `df` to a sibling temp dir, then
    * swap it into `path` via the two-rename [[checkedSwap]]. A
    * concurrent reader sees either the previous complete summary or
    * the new one — never the half-deleted directory that a plain
    * `mode("overwrite").parquet(path)` exposes mid-rewrite. First
    * publish (no prior dir) is a single rename. For the SMALL
    * re-published summaries of the streaming sinks (model fits,
    * leaderboards, audits) — large partitioned state goes through
    * dynamic partition overwrite instead. */
  private[graft] def publishParquet(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new Path(hPath.getParent, s".${hPath.getName}_publish_tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.exists(hPath)) {
      // first publish: the destination's parent may not exist yet, and
      // Hadoop rename requires it
      Option(hPath.getParent).foreach(fs.mkdirs(_))
      if (!fs.rename(tmp, hPath))
        throw new java.io.IOException(
          s"publish: could not move $tmp into place at $hPath")
    } else {
      val bak = new Path(hPath.getParent, s".${hPath.getName}_publish_old")
      checkedSwap(fs, hPath, tmp, bak)
    }
  }

  /** Two-rename swap with CHECKED renames (Hadoop reports most rename
    * failures by returning false, not throwing): `dir` → `bak`,
    * `tmp` → `dir`, drop `bak`. A failed second rename restores the
    * backup before throwing, so the original data is never lost; a
    * crash between the renames leaves it intact under `bak`,
    * recoverable by a rename. Shared by every compactor (parquet dirs,
    * stored indexes, streaming state). */
  private[graft] def checkedSwap(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      bak: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(dir, bak))
      throw new java.io.IOException(
        s"compact: could not move $dir aside; data untouched")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // roll back — original data untouched
      throw new java.io.IOException(
        s"compact: swap failed for $dir; original restored")
    }
    fs.delete(bak, true)
  }

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

  /** Training-set layout sink: materialize
    * [[graft.text.TextOps.trainingShards]] as `shard=N/` parquet
    * directories whose row order IS the training read order. One hash
    * exchange moves each row to its shard's writer task; each task then
    * sorts only its own shard (`sortWithinPartitions` — per-task sort, no
    * global range exchange, no driver coordination). Epoch readers stream
    * the shard dirs sequentially; a re-run with the same seed writes a
    * byte-identical layout. */
  def shardedTrainingSet(df: DataFrame, path: String, nShards: Int = 8,
                         idCol: String = "doc_id",
                         seed: String = ""): Unit =
    graft.text.TextOps.trainingShards(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "shard_order", idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** [[shardedTrainingSet]] plus a `manifest.json` beside the shard tree:
    * per-shard row count, character volume (when a `text` column exists),
    * and an ORDER-SENSITIVE content checksum — xxhash64(shard_order, id)
    * XOR-folded per shard (overflow-free under ANSI), so any dropped,
    * duplicated, or re-ordered row changes the value. Training jobs verify the tree against the
    * manifest before an epoch; a same-seed re-write reproduces identical
    * checksums (the layout is deterministic). The stats aggregation
    * reduces to |shards| rows before the driver sees it — safe at any
    * corpus size; the manifest is written driver-side as one small file. */
  def shardedTrainingSetWithManifest(df: DataFrame, path: String,
                                     nShards: Int = 8,
                                     idCol: String = "doc_id",
                                     seed: String = ""): Unit = {
    shardedTrainingSet(df, path, nShards, idCol, seed)
    val back = df.sparkSession.read.parquet(path)
    val chars =
      if (back.columns.contains("text")) sum(length(col("text")))
      else lit(null).cast("long")
    val stats = back.groupBy("shard")
      .agg(count(lit(1)).as("rows"), chars.as("chars"),
        bit_xor(xxhash64(col("shard_order"), col(idCol))).as("checksum"))
      .orderBy("shard").collect()
    val json = stats.map { r =>
      val c = if (r.isNullAt(2)) "null" else r.getLong(2).toString
      s"""{"shard":${r.getAs[Any]("shard")},"rows":${r.getLong(1)},""" +
        s""""chars":$c,"checksum":${r.getLong(3)}}"""
    }.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "manifest.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
