package graft.sinks

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the file-skipping indexes (ZoneMap, ZOrder,
  * BloomIndex): what counts as a data file, and how a Hadoop
  * `Configuration` ships to executors. One definition — three indexes
  * that disagree on either of these silently disagree on coverage.
  */
private[sinks] object IndexUtil {

  /** The table's data files: visible parquet, excluding markers, index
    * dirs, and hidden/attempt entries.
    */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
  }

  /** Hadoop `Configuration` is not `java.io.Serializable`; this is the
    * standard Writable-over-Java-serialization envelope so executors can
    * open footers against the driver's filesystem configuration.
    */
  final class SerializableConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false); conf.readFields(in)
    }
  }
}
