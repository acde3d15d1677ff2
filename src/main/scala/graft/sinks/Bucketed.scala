package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins: write both sides bucketed (and
  * sorted) by the join key and repeated joins plan with NO exchange on
  * either side — the shuffle is paid once at write time instead of per
  * query. The 100 TB pattern for fact tables joined on the same key by
  * many downstream jobs (the reference has no equivalent; its inter-job
  * format is unbucketed files re-shuffled per job).
  *
  * Spark requires bucketed data to live in the catalog (`saveAsTable`);
  * bucket counts must match across join sides.
  */
object Bucketed {

  def write(df: DataFrame, tableName: String, bucketBy: Seq[String], nBuckets: Int,
      sortBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // a stale location from a previous session (dir exists, table not in
    // this catalog) makes saveAsTable fail even in overwrite mode.
    // Resolve the identifier + location through the CATALOG: building
    // warehousePath/<name> by hand ignores the current database — under
    // `USE mydb` it would delete DEFAULT.<name>'s live data and miss the
    // actual stale dir (warehouse/mydb.db/<name>)
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketBy.head, bucketBy.tail: _*)
    (if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w)
      .saveAsTable(tableName)
  }

  def read(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}
