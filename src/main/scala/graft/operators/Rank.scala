package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking.
  *
  * A bare `Window.orderBy` (no partitionBy) funnels every row through a
  * single task — the classic single-node bottleneck. This utility
  * produces the identical total ranking with bounded per-task work:
  *
  *   1. range-partition the input on the sort keys (sampled bounds, so
  *      partitions are sort-ordered AND balanced);
  *   2. `row_number` within each partition (parallel);
  *   3. add each partition's cumulative row-count offset, computed on a
  *      frame with ONE ROW PER PARTITION (bounded by cluster width, not
  *      data size) and broadcast back.
  *
  * Mirrors the reference's review-queue ordering semantics
  * (review_adapter.py:81) without its single-stream sort.
  */
object Rank {

  /** Global `row_number() over (order by sortKeys)` as `outCol` (long),
    * computed with no single-partition stage. `sortKeys` should end in
    * a unique tiebreaker for a deterministic total order.
    */
  def globalRowNumber(df: DataFrame, sortKeys: Seq[Column], outCol: String): DataFrame = {
    // Range shuffle: partition i holds keys strictly before partition
    // i+1, so per-partition ranks + offsets compose to the global rank.
    // Cached because both the counts branch and the rank branch read
    // it; registered with graft.Caches for session-level release.
    val parted = graft.Caches.cached(df.repartitionByRange(sortKeys: _*))

    val counts = parted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
    // Window over the counts frame only: ≤ numPartitions rows total, so
    // the unpartitioned running sum here is metadata-sized by design.
    val offsets = counts
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__cnt")

    val localW = Window.partitionBy(col("__pid")).orderBy(sortKeys: _*)
    parted
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
