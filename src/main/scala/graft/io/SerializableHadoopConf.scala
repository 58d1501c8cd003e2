package graft.io

/** Hadoop `Configuration` is not Java-serializable; this holder writes
  * it through its own Writable form so executor-side tasks (the binary
  * sinks' `mapPartitions`) see the driver's FS settings — the standard
  * wrapper, re-rolled because Spark's own is package-private. */
private[io] final class SerializableHadoopConf(
    @transient var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

/** Task-commit protocol for the hand-rolled binary sinks ([[Tfrecord]],
  * [[WebDataset]]): with speculative execution or a zombie attempt,
  * two attempts of the same task can run concurrently — streaming both
  * into the SAME final file interleaves their records and corrupts the
  * shard. Instead each attempt streams to an attempt-unique temp name
  * and renames into place when done: the first rename wins, a loser
  * finds the destination taken and drops its temp. Both attempts
  * encode the same partition, so either file IS the shard and the
  * losing attempt's manifest counts still hold. */
private[io] object ShardCommit {
  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Attempt-unique temp path for a shard destined for `dir/name`. */
  def attemptTemp(dir: String, name: String): Path = {
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(0L)
    new Path(s"$dir/_tmp-$name-attempt-$attempt")
  }

  /** Publish a finished temp shard at its final name (rename is the
    * atom every Hadoop FS provides). Destination already taken → a
    * sibling attempt won; discard ours. */
  def commit(fs: FileSystem, tmp: Path, dest: Path): Unit = {
    if (!fs.rename(tmp, dest)) {
      if (fs.exists(dest)) fs.delete(tmp, false)
      else throw new java.io.IOException(
        s"shard commit failed: $tmp -> $dest")
    }
  }
}
