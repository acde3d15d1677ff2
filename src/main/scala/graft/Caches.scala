package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for intermediates persisted inside operators (dedup candidate
  * frames, the master-selection cogroup). The frames are hidden behind
  * the operators' return values, so callers can't unpersist them —
  * `Caches.clear(spark)` releases everything graft persisted without
  * touching user caches (unlike `spark.catalog.clearCache`). Long-lived
  * sessions should call it between batches; Verify/Bench call it between
  * queries.
  */
object Caches {

  private val tracked = mutable.Set.empty[DataFrame]

  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df
  }

  /** Unpersist every operator-internal cache created so far. */
  def clear(spark: SparkSession): Unit = synchronized {
    tracked.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    tracked.clear()
  }
}
