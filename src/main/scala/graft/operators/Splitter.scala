package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** H3 `Splitter` (`/root/reference/jobs/hi-order/job-splitter.js:65-134`):
  * fan-out one stream to N receivers — multicast (no router) or routed by a
  * per-record index, where an out-of-range index silently drops the record
  * (`job-splitter.js:119-123`).
  *
  * Spark shape: the upstream plan is persisted once, then each receiver is an
  * independent action over it — multicast costs one materialization, not N
  * recomputes. Routed splits with many receivers should prefer
  * [[routedWrite]] (single pass, `partitionBy` on the route column) over N
  * filtered writes.
  */
object Splitter {

  /** Multicast: every record to every receiver. */
  def multicast(df: DataFrame, receivers: Seq[DataFrame => Unit],
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): Unit = {
    val cached = df.persist(storage)
    try receivers.foreach(r => r(cached))
    finally { cached.unpersist(); () }
  }

  /** Routed: `route` evaluates to a receiver index per record; records whose
    * index is outside [0, receivers.size) are dropped, like the reference.
    */
  def routed(df: DataFrame, route: Column, receivers: Seq[DataFrame => Unit],
             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): Unit = {
    val cached = df.withColumn("__route", route).persist(storage)
    try receivers.zipWithIndex.foreach { case (r, i) =>
      r(cached.filter(col("__route") === i).drop("__route"))
    }
    finally { cached.unpersist(); () }
  }

  /** Routed fan-out as a single-pass partitioned write: one job, one shuffle,
    * output laid out as `route=<i>/` directories — the 100 TB-safe demux
    * (N filtered writes would re-scan the input N times).
    */
  def routedWrite(df: DataFrame, route: Column, path: String, format: String = "parquet",
                  validRoutes: Int): Unit =
    df.withColumn("route", route)
      .filter(col("route") >= 0 && col("route") < validRoutes) // out-of-range → dropped
      .write.partitionBy("route").format(format).mode("overwrite").save(path)
}
