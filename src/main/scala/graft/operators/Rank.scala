package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable global ranking.
  *
  * A bare `Window.orderBy` (no partitionBy) funnels every row through a
  * single task — the classic single-node bottleneck. This utility
  * produces the identical total ranking with bounded per-task work and
  * exactly ONE data-scale shuffle:
  *
  *   1. range-partition the input on the sort keys (sampled bounds, so
  *      partitions are sort-ordered AND balanced) and sort within each
  *      partition — the only exchange the data itself ever takes;
  *   2. the partition-local row number is a pure projection over the
  *      sorted slices: `monotonically_increasing_id()` carries the
  *      record number within the partition in its low 33 bits (the
  *      function's documented layout), so no Window operator and no
  *      second hash shuffle of the data are needed;
  *   3. each partition's cumulative row-count offset comes from a frame
  *      with ONE ROW PER PARTITION (bounded by cluster width, not data
  *      size): the running sum over it is a broadcast theta-join
  *      (`b.__pid < a.__pid`), so no stage anywhere in the plan —
  *      metadata or data — requires a SinglePartition distribution.
  *
  * Mirrors the reference's review-queue ordering semantics
  * (review_adapter.py:81) without its single-stream sort.
  */
object Rank {

  private val LocalIdMask = (1L << 33) - 1

  /** Global `row_number() over (order by sortKeys)` as `outCol` (long),
    * computed with no single-partition stage and no Window operator.
    * `sortKeys` should end in a unique tiebreaker for a deterministic
    * total order. Requires < 2^33 rows per partition (≈8.6 B — far
    * above any sane partition size).
    */
  def globalRowNumber(df: DataFrame, sortKeys: Seq[Column], outCol: String): DataFrame = {
    // Range shuffle + in-partition sort: partition i holds keys strictly
    // before partition i+1 and rows are sorted inside each slice, so
    // per-partition positions + offsets compose to the global rank.
    // Cached because both the counts branch and the rank branch read
    // it; registered with graft.Caches for session-level release.
    val parted = graft.Caches.cached(
      df.repartitionByRange(sortKeys: _*).sortWithinPartitions(sortKeys: _*))

    // monotonically_increasing_id is nondeterministic, which pins the
    // projection ABOVE the in-partition sort (Catalyst will not reorder
    // nondeterministic expressions across a Sort) — the low 33 bits are
    // therefore the row's position in sorted order.
    val local = parted
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", (monotonically_increasing_id().bitwiseAND(lit(LocalIdMask)) + 1L))

    // The counts job doubles as a runtime invariant check: the low-33-bit
    // layout of monotonically_increasing_id and the guarantee that
    // Catalyst keeps the nondeterministic projection above the Sort are
    // Spark implementation details, not API contracts. If either ever
    // drifts, max(__lrn) per partition stops matching the row count —
    // the job fails fast here (metadata-sized check, one row per
    // partition) instead of silently emitting corrupt global ranks.
    val counts = local
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"), max(col("__lrn")).as("__m"))
      .select(col("__pid"),
        when(col("__m") === col("__c"), col("__c"))
          .otherwise(raise_error(concat(
            lit("globalRowNumber invariant violated on partition "), col("__pid"),
            lit(": max local row number "), col("__m"),
            lit(" != partition count "), col("__c"),
            lit(" — monotonically_increasing_id layout or projection "
              + "placement changed in this Spark version"))))
          .as("__cnt"))
    // Running sum over the counts frame WITHOUT an unpartitioned window:
    // ≤ numPartitions rows join ≤ numPartitions broadcast rows, so the
    // theta-join is metadata-sized by design and keeps every exchange in
    // the plan hash- or range-partitioned.
    val offsets = counts.alias("a")
      .join(broadcast(counts.alias("b")), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))

    local
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
