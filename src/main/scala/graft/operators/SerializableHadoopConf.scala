package graft.operators

import org.apache.hadoop.conf.Configuration

/** A Hadoop `Configuration` that survives task serialization — what
  * lets metadata work (parquet footer reads) DISTRIBUTE across
  * executors instead of serializing through the driver. Same shape as
  * Spark's internal wrapper, re-implemented because that one is
  * `private[spark]`. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
