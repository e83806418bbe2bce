package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd loaders for the test star schema (TESTDATA.md).
  *
  * One parquet file per table under `dir`. Loaders stay lazy
  * DataFrames so Catalyst pushes filters/projections into the scan —
  * at 100 TB the scan only reads the columns/row-groups a query
  * touches.
  */
object Tables {
  /** Inferred schema per (session, file), memoized: a bare
    * `spark.read.parquet(path)` runs a footer-reading schema-inference
    * JOB on every call — graft.Profile showed one ~30-50 ms
    * "parquet at Tables.scala" stage per table per query invocation
    * (q7_volume alone paid five). Passing the memoized schema skips
    * the inference job; the DATA is still scanned by every query
    * (this caches metadata only, guide §6 file-listing discipline).
    * Keyed by session identity so a fresh session (new process, test
    * suite) re-infers.
    */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaMemo.computeIfAbsent(
      (System.identityHashCode(spark), path),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and truncate to micros —
    * exactly what DuckDB's µs-precision timestamps do, so oracle
    * parity holds.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros (DuckDB semantics)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // wall time → session-UTC instant
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Guard against under-parallelized inputs ahead of per-row kernel
    * work (md5 grams, minhash signatures, sketch hashing): a corpus
    * that arrives as one small parquet file yields ONE scan split
    * (row-group granularity — `maxPartitionBytes` cannot split
    * further), so a corpus-wide kernel pass runs on one core while the
    * rest idle. When the scan is narrower than half the session's
    * parallelism, redistribute to the session width — hash on `keys`
    * when given (deterministic, no pre-sort), round-robin otherwise.
    * At scale the input has >= width splits and this is a NO-OP (no
    * shuffle inserted), so it is the guide's input-skew remedy
    * (§2.5 "one huge unsplittable file ... repartition immediately
    * after the read"), not a local-core-count tune. Project to the
    * needed columns BEFORE widening so the exchange carries only them.
    */
  def wide(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (scanWidth(df) * 2 >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

  /** Partition count of `df`'s scan, memoized per (session, semantic
    * plan): `df.rdd` pays a full physical planning pass per call, and
    * every bench invocation of an operator re-built its frames — the
    * probe was costing 50-150 ms of plan-construction per wide() site
    * per run (measured via graft.Profile plan-construction time). The
    * memo key is the analyzed plan's semanticHash — a collision only
    * mis-sizes a repartition decision, never affects results. Static
    * inputs per process; partition counts for a given plan are stable.
    */
  private val widthMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]()
  private[graft] def scanWidth(df: DataFrame): Int = {
    val key = (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash())
    widthMemo.computeIfAbsent(key,
      _ => Integer.valueOf(df.rdd.getNumPartitions)).intValue()
  }
}
