package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Range-sorted file output: `repartitionByRange` on the sort keys (range
  * partitioner from a sampled key distribution — balanced files even on
  * skewed keys) + `sortWithinPartitions`, so files are globally ordered
  * and internally sorted. Parquet then stores tight min/max stats per
  * file/row-group and any reader filtering on a sort-key prefix prunes
  * whole files without opening them — the standard layout for 100 TB
  * scan-heavy tables queried by time/id range.
  *
  * `maxRecordsPerFile` caps file size regardless of partition count (a
  * hot range still splits into bounded files).
  */
object SortedOutput {

  def write(df: DataFrame, path: String, sortCols: Seq[String],
      nFiles: Int, maxRecordsPerFile: Long = 0L,
      format: String = "parquet"): Unit = {
    val keys: Seq[Column] = sortCols.map(col)
    val w = df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").format(format)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
     else w).save(path)
  }
}
