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
