package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional DATA LAYOUT — Z-order (Morton) clustering, the
  * lever that makes a 100 TB table prunable on MORE THAN ONE column:
  * a range-partitioned, sorted layout on an interleaved-bit key gives
  * every output file a small bounding box in EVERY interleaved
  * dimension, so parquet min/max statistics (row-group and file level)
  * become selective for filters on any of them — where a plain sort
  * serves only its leading column. The same technique Delta/Iceberg
  * expose as `ZORDER BY` / sort-order transforms, here as plain
  * column math + `repartitionByRange`, engine-portable.
  *
  * Everything is exact integer arithmetic on the plan (shifts, masks,
  * adds — codegen'd, replayable verbatim by any SQL engine), so the
  * key is strictly oracle-able. The write moves each row exactly once
  * (one range exchange to its shard, sorted within) — the shard-layout
  * ledger shape.
  */
object Layout {

  /** The Morton (Z-order) key of k already-quantized dimensions: bit i
    * of dimension j lands at interleaved position i·k + j. Inputs are
    * masked to `bits` (hash-derived bucket values wrap naturally;
    * quantize real domains with [[quantizeMinMax]] first). k·bits ≤ 63
    * keeps the key in a signed LONG. Pure integer column math — no
    * UDF, no kernel, portable to any engine. */
  def mortonKey(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty, "mortonKey needs at least one dimension")
    val k = dims.size
    require(bits >= 1 && k * bits <= 63,
      s"k*bits must fit a signed long: $k*$bits")
    val mask = (1L << bits) - 1
    val terms = for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield {
      val bit = shiftright(d.cast("long").bitwiseAND(lit(mask)), i)
        .bitwiseAND(lit(1L))
      shiftleft(bit, i * k + j)
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear quantization of a numeric column onto [0, 2^bits): the
    * min/max are OPERATOR CONSTANTS (from profiling or a prior pass —
    * never computed inline, which would add a hidden corpus scan).
    * Values outside [min, max] clamp to the edge buckets. */
  def quantizeMinMax(c: Column, min: Double, max: Double,
                     bits: Int = 16): Column = {
    require(max > min, s"max must exceed min: [$min, $max]")
    val buckets = (1L << bits).toDouble
    val scaled = (c.cast("double") - lit(min)) / lit(max - min)
    least(greatest(floor(scaled * lit(buckets)).cast("long"), lit(0L)),
      lit((1L << bits) - 1))
  }

  /** Per-file, per-column min/max from parquet FOOTERS — the audit
    * that proves (or disproves) a layout's pruning claim with the
    * exact statistics the scanner's row-group skipping reads, not a
    * re-scan of the data. Driver-side over the directory's footer
    * metadata (|files| bounded — file counts are operator-scale);
    * values render as strings (parquet statistics are typed per
    * column). One row per (file, row_group, column) — aggregate over
    * row_group for per-file bounds. */
  def parquetStats(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    // recurse: partitioned tables nest files under key=value dirs — a
    // top-level-only listing would read as "no statistics" rather
    // than "unsupported layout"
    def walk(p: org.apache.hadoop.fs.Path)
        : Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap { f =>
        if (f.isDirectory) walk(f.getPath)
        else if (f.getPath.getName.endsWith(".parquet"))
          Seq(f.getPath)
        else Seq.empty
      }
    val files = walk(root)
    require(files.nonEmpty,
      s"no .parquet files under $path (recursive) — nothing to audit")
    val rows = files.flatMap { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        blocks.zipWithIndex.flatMap { case (b, gi) =>
          b.getColumns.asScala.map { c =>
            val st = c.getStatistics
            val (mn, mx) =
              if (st == null || !st.hasNonNullValue) (null, null)
              else (st.minAsString(), st.maxAsString())
            (p.getName, gi, c.getPath.toDotString,
              b.getRowCount, mn, mx)
          }
        }
      } finally reader.close()
    }
    import spark.implicits._
    rows.toDF("file", "row_group", "column", "n_rows", "min", "max")
  }

  /** Write `df` Z-ordered on `dims` into `shards` files: ONE range
    * exchange on the Morton key (each row moves exactly once to its
    * shard), sorted within each shard so row groups inherit tight
    * min/max bounds on every dimension. The key column is dropped
    * from the written schema — it is layout, not data. */
  def writeZordered(df: DataFrame, path: String, dims: Seq[Column],
                    shards: Int, bits: Int = 16): Unit = {
    require(shards >= 1, s"shards must be positive, got $shards")
    df.withColumn("_zkey", mortonKey(dims, bits))
      .repartitionByRange(shards, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
