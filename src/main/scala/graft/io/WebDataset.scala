package graft.io

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset tar-shard sink + reader — the multimodal export sibling
  * of [[Tfrecord]]: WebDataset (img2dataset, the open LAION tooling,
  * torchdata pipes) streams samples from plain POSIX tar shards where
  * every member is `<key>.<extension>` and all members sharing a key
  * form one sample. A curated asset corpus leaves this engine as
  * shards any of those loaders mount directly.
  *
  * The tar layer is hand-encoded ustar (POSIX.1-1988, the format every
  * tar since 1988 reads): one 512-byte header per member — name,
  * zero-padded octal size/mode/mtime, the space-seeded checksum,
  * typeflag '0', magic "ustar" NUL "00" — data rounded up to 512,
  * two zero blocks at the end. No library dependency.
  *
  * Column mapping: `keyCol` names the sample; EVERY other column
  * becomes the member `<key>.<column name>` — so callers alias columns
  * to the extensions their loader decodes (`bin`, `txt`, `json`,
  * `cls`, ...). binary columns write raw bytes, strings UTF-8, any
  * other type its canonical string form; null columns are ABSENT from
  * the sample (the WebDataset missing-member convention). Members of a
  * sample are adjacent and in column order; samples follow the
  * partition's row order.
  *
  * Scale shape: identical to [[Tfrecord]] — per-row encode inside
  * `mapPartitions` (a tar sink has no DataSource), one sequential
  * shard stream per non-empty partition, |shards|-row manifest
  * returned; shard sizing = the caller's repartition. */
object WebDataset {

  private def octal(value: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(value)
    val padded = ("0" * (width - 1 - s.length)) + s + " "
    padded.getBytes(UTF_8)
  }

  /** One ustar member: 512-byte header + data + zero padding. */
  def tarMember(name: String, data: Array[Byte]): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100,
      s"tar member name over 100 bytes: $name")
    val h = new Array[Byte](512)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, name.getBytes(UTF_8))
    put(100, octal(420L, 8)) // mode 0644
    put(108, octal(0L, 8)) // uid
    put(116, octal(0L, 8)) // gid
    put(124, octal(data.length.toLong, 12))
    put(136, octal(0L, 12)) // mtime: fixed 0 → deterministic bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum seed
    h(156) = '0' // typeflag: regular file
    put(257, "ustar".getBytes(UTF_8)) // POSIX magic; byte 262 stays NUL
    put(263, "00".getBytes(UTF_8)) // version
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, "%06o".format(sum).getBytes(UTF_8))
    h(154) = 0 // canonical "%06o" NUL space terminator
    h(155) = ' '
    val padded = (data.length + 511) / 512 * 512
    val out = new Array[Byte](512 + padded)
    System.arraycopy(h, 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  /** Write `df` as WebDataset tar shards, one `part-<id>.tar` per
    * non-empty partition; returns the manifest
    * (file, n_samples, n_members, n_bytes). Overwrites `path`. */
  def writeWebDatasetShards(df: DataFrame, path: String,
                            keyCol: String = "key"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    require(schema.fieldNames.contains(keyCol),
      s"keyCol $keyCol not in ${schema.fieldNames.mkString(",")}")
    val memberFields = schema.fields.zipWithIndex
      .filter(_._1.name != keyCol)
    val keyIdx = schema.fieldIndex(keyCol)
    val hconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val out = new Path(path)
    val fs = out.getFileSystem(hconf.conf)
    fs.delete(out, true)
    fs.mkdirs(out)
    import spark.implicits._
    val manifest = df.rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      if (!it.hasNext) Iterator.empty
      else {
        val fname = "part-%05d.tar".format(pid)
        val file = new Path(s"$path/$fname")
        val tmp = ShardCommit.attemptTemp(path, fname)
        val fsx = file.getFileSystem(hconf.conf)
        val os = fsx.create(tmp, true)
        var samples = 0L
        var members = 0L
        var bytes = 0L
        it.foreach { row =>
          val key = String.valueOf(row.get(keyIdx))
          memberFields.foreach { case (f, i) =>
            val v = row.get(i)
            if (v != null) {
              val data = f.dataType match {
                case BinaryType => v.asInstanceOf[Array[Byte]]
                case StringType => v.asInstanceOf[String].getBytes(UTF_8)
                case _ => String.valueOf(v).getBytes(UTF_8)
              }
              val m = tarMember(s"$key.${f.name}", data)
              os.write(m)
              members += 1
              bytes += m.length
            }
          }
          samples += 1
        }
        os.write(new Array[Byte](1024)) // end-of-archive blocks
        bytes += 1024
        os.close()
        ShardCommit.commit(fsx, tmp, file)
        Iterator((file.getName, samples, members, bytes))
      }
    }.collect() // |shards| rows — an operator constant
    manifest.toSeq.toDF("file", "n_samples", "n_members", "n_bytes")
      .orderBy("file")
  }

  /** Read tar shards back as (file, name, content) member rows —
    * checksum-verified headers, the ingestion complement (zip has
    * [[Archives]]; tar arrives from WebDataset drops and plain
    * exports). Only regular-file members (typeflag '0'/NUL) become
    * rows: PAX 'x'/'g' headers, GNU 'L'/'K' long-name blocks, and
    * '5' directories — routine in externally-produced tars — are
    * skipped with their data blocks so the member stream stays
    * aligned. Rides the `binaryFile` source, one task per shard. */
  def readMembers(spark: SparkSession, path: String,
                  glob: String = "*.tar"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/$glob")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val fname = p.substring(p.lastIndexOf('/') + 1)
        val outRows = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Array[Byte])]
        var pos = 0
        var done = false
        while (!done && pos + 512 <= bytes.length) {
          if (bytes(pos) == 0) done = true // end-of-archive zero block
          else {
            val nameEnd0 = bytes.indexOf(0.toByte, pos)
            val nameEnd = if (nameEnd0 < 0 || nameEnd0 > pos + 100)
              pos + 100 else nameEnd0
            val name = new String(bytes, pos, nameEnd - pos, UTF_8)
            val sizeStr = new String(bytes, pos + 124, 12, UTF_8)
              .takeWhile(c => c >= '0' && c <= '7')
            val size = java.lang.Long.parseLong(sizeStr, 8).toInt
            // verify the header checksum (spaces over its own field)
            val stored = new String(bytes, pos + 148, 8, UTF_8)
              .takeWhile(c => c >= '0' && c <= '7')
            var sum = 0L
            var i = 0
            while (i < 512) {
              val b = if (i >= 148 && i < 156) ' '.toByte
                else bytes(pos + i)
              sum += (b & 0xff); i += 1
            }
            require(java.lang.Long.parseLong(stored, 8) == sum,
              s"tar checksum mismatch at $fname:$pos")
            // Only regular files ('0' / NUL) are sample members.
            // Externally-produced tars (Python tarfile defaults to PAX)
            // carry 'x'/'g' PaxHeaders, GNU 'L'/'K' longname/longlink
            // blocks, and '5' directories — metadata, not data: skip
            // them but still advance past their data blocks, or the
            // stream desynchronizes and every later header misparses.
            val typeflag = bytes(pos + 156)
            if (typeflag == '0'.toByte || typeflag == 0.toByte) {
              val data = java.util.Arrays.copyOfRange(bytes, pos + 512,
                pos + 512 + size)
              outRows += ((fname, name, data))
            }
            pos += 512 + (size + 511) / 512 * 512
          }
        }
        outRows
      }.toDF("file", "name", "content")
  }
}
