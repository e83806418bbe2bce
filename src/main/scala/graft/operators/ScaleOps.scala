package graft.operators

import graft.Tables
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2D scale tooling surfaced as oracle-checked queries.
  *
  * The custom TopKPerGroup physical operator and the salted skew join
  * were previously ScalaTest-only; these two queries put them under
  * the DuckDB hash gate so the driver verifies their SEMANTICS, not
  * just that they run — the custom plan must produce exactly the rows
  * a window-rank would, and the salted join must preserve row
  * multiplicity exactly.
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame

  // --- q_topk_group: TopKPerGroup custom plan under the oracle -------
  // Bounded-heap top-5 lineitems per (returnflag, linestatus):
  // partial heaps map-side → shuffle ≤ k rows/group/partition → final
  // heaps. The oracle is the O(n log n) window-rank formulation — the
  // plans differ, the rows must not. The final row_number runs over
  // ≤ k rows per group (30 rows total), not the full table.
  val qTopkGroup: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
      col("l_linenumber"), col("l_extendedprice"))
    val top = TopK.topKPerGroup(li, Seq("l_returnflag", "l_linestatus"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 5)
    val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("rank"))
  }

  val qTopkGroupSql: String =
    """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
      |       l_extendedprice, rnk AS rank FROM (
      |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
      |         l_extendedprice,
      |    CAST(row_number() OVER (PARTITION BY l_returnflag, l_linestatus
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rnk
      |  FROM lineitem) t
      |WHERE rnk <= 5 ORDER BY l_returnflag, l_linestatus, rank""".stripMargin

  // --- q_skew_join: salted join must equal the plain join ------------
  // Supplier revenue rollup through Skew.saltedJoin: lineitem rows get
  // a random salt, supplier replicates `salts` ways, the shuffle key
  // becomes (suppkey, salt) — a hot supplier's rows spread over 8
  // reducers instead of one. The oracle is the UNSALTED join: salting
  // must be invisible in the result (exact row multiplicity), which
  // the hash gate proves. Money math decimal-exact per SURVEY §6.
  val qSkewJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      col("l_suppkey").as("suppkey"),
      col("l_extendedprice"), col("l_discount"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    graft.operators.Skew.saltedJoin(li, sup, "suppkey", salts = 8)
      .groupBy(col("s_name"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  val qSkewJoinSql: String =
    """SELECT s_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS STRING) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  // --- profile_table: per-column data profiling -----------------------
  // The standard first query against a new 100 TB table: per column —
  // row count, null count, EXACT distinct count, lexicographic
  // min/max (values compared as strings, binary collation in both
  // engines). One explode to long form + one shuffle by column name;
  // the n_cols× row expansion is the same cost shape a multi-distinct
  // Expand would pay, and it profiles every column in a single pass
  // over the table.
  private val ProfileCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  val profileTable: Q = (s, d) => {
    val kvs = ProfileCols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v")))
    Tables.orders(s, d)
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.v").as("v"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .orderBy(col("col_name"))
  }

  val profileTableSql: String =
    """WITH s AS (
      |  SELECT kv.col_name, kv.v FROM orders, UNNEST([
      |    {'col_name': 'o_orderkey', 'v': CAST(o_orderkey AS VARCHAR)},
      |    {'col_name': 'o_custkey', 'v': CAST(o_custkey AS VARCHAR)},
      |    {'col_name': 'o_orderstatus', 'v': CAST(o_orderstatus AS VARCHAR)},
      |    {'col_name': 'o_totalprice', 'v': CAST(o_totalprice AS VARCHAR)},
      |    {'col_name': 'o_orderpriority', 'v': CAST(o_orderpriority AS VARCHAR)}
      |  ]) AS t(kv))
      |SELECT col_name,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
      |  min(v) AS min_v,
      |  max(v) AS max_v
      |FROM s GROUP BY col_name ORDER BY col_name""".stripMargin

  // --- src_format_roundtrip: readers/writers under the oracle ---------
  // The §2D source/sink surface gets a semantic gate, not just "it
  // runs": a deterministic lineitem slice is written to CSV, JSON and
  // ORC (pid-scoped tmp dirs), read back with explicit schemas
  // (inference never touches a 100 TB file), and aggregated per
  // format. The oracle computes the same aggregate from the parquet
  // ground truth once per format tag — any reader/writer corruption
  // (type drift, null mangling, quoting, timezone) breaks the hash.
  // Plain-typed columns only; the timestamp travels as an ISO day
  // string, which is the only CSV-safe timestamp representation.
  val srcFormatRoundtrip: Q = (s, d) => {
    import org.apache.spark.sql.types._
    val slice = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 1000 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType), StructField("ship_day", StringType)))
    val base = System.getProperty("java.io.tmpdir") + "/graft_rt_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    slice.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    slice.write.mode("overwrite").json(s"$base/json")
    slice.write.mode("overwrite").orc(s"$base/orc")
    val back = Seq(
      graft.sources.Sources.readCsv(s, s"$base/csv", schema).withColumn("format", lit("csv")),
      graft.sources.Sources.readJson(s, s"$base/json", schema).withColumn("format", lit("json")),
      graft.sources.Sources.readOrc(s, s"$base/orc", Some(schema))
        .withColumn("format", lit("orc")))
      .reduce(_ unionByName _)
    back.groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"),
        min(col("ship_day")).as("first_day"), max(col("ship_day")).as("last_day"),
        countDistinct(col("l_returnflag")).as("n_flags"))
      .orderBy(col("format"))
  }

  val srcFormatRoundtripSql: String =
    """WITH slice AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag,
      |    strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      |  FROM lineitem WHERE l_orderkey % 1000 = 0)
      |SELECT format, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  min(ship_day) AS first_day, max(ship_day) AS last_day,
      |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags
      |FROM slice, (SELECT unnest(['csv', 'json', 'orc']) AS format)
      |GROUP BY format ORDER BY format""".stripMargin

  // --- etl_schema_evolve: additive schema evolution under the gate ----
  // The ingest reality at scale: yesterday's files lack the column
  // added today. Batch 1 (old schema) and batch 2 (adds a discount
  // column) land in one dataset directory; a mergeSchema read must
  // surface the union schema with NULLs for the old batch — which the
  // aggregation then has to account for explicitly (null-aware
  // averages, per-batch null counts). The oracle reproduces the
  // evolution with a UNION of the two projections. Schema inference
  // cost note: mergeSchema reads ALL footers — production pins the
  // merged schema explicitly after evolving; the read here does both
  // (merge once, assert, aggregate).
  val etlSchemaEvolve: Q = (s, d) => {
    val base = System.getProperty("java.io.tmpdir") + "/graft_evolve_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 500 === 0)
    li.filter(col("l_linenumber") % 2 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .withColumn("batch", lit("old"))
      .write.mode("overwrite").parquet(s"$base/batch=old")
    li.filter(col("l_linenumber") % 2 =!= 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_discount"))
      .withColumn("batch", lit("new"))
      .write.mode("overwrite").parquet(s"$base/batch=new")
    s.read.option("mergeSchema", "true")
      .parquet(s"$base/batch=old", s"$base/batch=new")
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("n_null_discount"),
        sum(coalesce(col("l_discount").cast(DecimalType(4, 2)),
          lit(0).cast(DecimalType(4, 2)))).cast("double").as("sum_discount"))
      .orderBy(col("batch"))
  }

  val etlSchemaEvolveSql: String =
    """WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 500 = 0),
      |evolved AS (
      |  SELECT 'old' AS batch, l_quantity, CAST(NULL AS DOUBLE) AS l_discount
      |  FROM li WHERE l_linenumber % 2 = 0
      |  UNION ALL
      |  SELECT 'new' AS batch, l_quantity, l_discount
      |  FROM li WHERE l_linenumber % 2 <> 0)
      |SELECT batch, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_null_discount,
      |  CAST(SUM(COALESCE(CAST(l_discount AS DECIMAL(4,2)),
      |    CAST(0 AS DECIMAL(4,2)))) AS DOUBLE) AS sum_discount
      |FROM evolved GROUP BY batch ORDER BY batch""".stripMargin

  // --- q_bucket_join: co-located bucketed join under the gate ---------
  // Bucketing is THE repeated-join lever at 100 TB: both fact sides
  // pre-hashed into the same bucket layout on the join key, so the
  // sort-merge join reads co-located, pre-sorted buckets with NO
  // Exchange (and no sort) on either scan — ScaleToolsSpec asserts
  // exactly one Exchange survives the whole plan (the tiny
  // post-join groupBy), with broadcast disabled so the assertion
  // exercises the SMJ path. Tables are written ONCE per (jvm, corpus)
  // — write-once index discipline like ann_ivf_index — and the oracle
  // is the plain parquet join: bucketing must be invisible in the
  // result, which the hash gate proves.
  private case class BucketEntry(tag: String, fingerprint: String)
  private val bucketTables = new java.util.concurrent.ConcurrentHashMap[String, BucketEntry]()

  /** Drop the managed table AND its warehouse directory: a previous
    * JVM's warehouse leftovers are invisible to this catalog, and
    * CREATE TABLE AS refuses a pre-existing location.
    */
  private def freshTable(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, name.toLowerCase(java.util.Locale.ROOT))
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Cheap corpus fingerprint (source-dir mtimes + file counts) so a
    * corpus regenerated IN PLACE (ScaleData rewrites its target dir)
    * invalidates the memoized bucket tables instead of silently
    * serving stale data for the JVM's lifetime.
    */
  private def corpusFingerprint(s: SparkSession, d: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    Seq("orders.parquet", "lineitem.parquet").map { f =>
      val p = new org.apache.hadoop.fs.Path(d, f)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) "absent"
      else {
        val kids = fs.listStatus(p)
        val maxM = kids.map(_.getModificationTime).foldLeft(0L)(math.max)
        // total bytes too: mtime has 1 s granularity on many
        // filesystems, so a same-second in-place regeneration with an
        // unchanged part-file count would otherwise go undetected
        s"${kids.length}:$maxM:${kids.map(_.getLen).sum}"
      }
    }.mkString("|")
  }

  private val HeartbeatFile = "_graft_heartbeat"

  /** Builders drop a `_graft_heartbeat` marker (underscore prefix —
    * invisible to Spark scans, like _SUCCESS) in each bucket-table dir
    * and re-touch it every time the table pair is served, so a sibling
    * JVM sharing the warehouse keeps its tables visibly live no matter
    * how long its session runs; the reaper ages on the heartbeat, not
    * the dir mtime (which never changes after the initial write).
    */
  /** Returns false when the table dir is gone — including when a
    * sibling JVM's reaper deletes it BETWEEN the exists check and the
    * touch (the FileNotFoundException is that race, not an error). A
    * false return is a liveness signal: the caller must invalidate its
    * memoized entry and rebuild.
    */
  private def touchHeartbeat(s: SparkSession, table: String): Boolean = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val dir = new org.apache.hadoop.fs.Path(wh, table.toLowerCase(java.util.Locale.ROOT))
    val p = new org.apache.hadoop.fs.Path(dir, HeartbeatFile)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    try {
      if (fs.exists(p)) { fs.setTimes(p, System.currentTimeMillis(), -1); true }
      else if (fs.exists(dir)) {
        fs.create(p, true).close()
        // fs.create makes missing parents, so a dir reaped between the
        // exists check and here would be silently resurrected as a
        // zombie holding only the heartbeat — verify real table data is
        // present, and undo only OUR file if not. Deleting the whole
        // dir here would race a sibling JVM that just created the same
        // dir as the start of a rebuild (its first data file not yet
        // landed); removing just the heartbeat leaves its build intact,
        // and a genuinely empty zombie dir ages out via the reaper.
        val hasData = fs.listStatus(dir).exists(_.getPath.getName != HeartbeatFile)
        if (!hasData) { fs.delete(p, false); false } else true
      }
      else false
    } catch {
      case _: java.io.FileNotFoundException => false
    }
  }

  /** Reap bucket tables whose tag no session-live corpus owns: drop
    * the catalog entries and delete the warehouse dirs. Previous JVMs
    * leave their `*_bj_*` dirs behind (the catalog forgets them, the
    * filesystem doesn't), so without this the warehouse grows one
    * table pair per (JVM, corpus) forever.
    */
  private def reapStaleBucketTables(s: SparkSession, knownStale: Set[String]): Unit = {
    val liveTags = {
      import scala.jdk.CollectionConverters._
      bucketTables.values.asScala.map(_.tag).toSet
    }
    val pat = "^(orders|lineitem)_bj_([0-9a-f]{16})$".r
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val whPath = new org.apache.hadoop.fs.Path(wh)
    val fs = whPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    // Liveness is only knowable for THIS process's map: a sibling
    // process sharing the warehouse has live tags this map can't see.
    // So reap immediately only tags THIS process knows are stale (the
    // corpus's own superseded tag), and age-gate everything else on
    // the table's HEARTBEAT file — a long-running sibling re-touches
    // it on every serve, so "stale" means no process has used the
    // table for an hour, not merely that it was CREATED over an hour
    // ago. Dirs from pre-heartbeat builds fall back to dir mtime.
    val minAgeMs = 60L * 60 * 1000
    val now = System.currentTimeMillis()
    if (fs.exists(whPath)) fs.listStatus(whPath).foreach { st =>
      st.getPath.getName match {
        case pat(_, tag) if !liveTags.contains(tag) =>
          val hb = new org.apache.hadoop.fs.Path(st.getPath, HeartbeatFile)
          // a sibling process can reap this same dir between listStatus
          // and here — a vanished heartbeat falls back to the listed
          // dir mtime (already in memory) instead of aborting the pass
          // (and the enclosing bucket-table build); fs.delete on an
          // already-reaped dir is a no-op
          val lastAlive =
            try fs.getFileStatus(hb).getModificationTime
            catch { case _: java.io.FileNotFoundException => st.getModificationTime }
          if (knownStale.contains(tag) || now - lastAlive > minAgeMs) {
            s.sql(s"DROP TABLE IF EXISTS ${st.getPath.getName}")
            fs.delete(st.getPath, true)
          }
        case _ => ()
      }
    }
  }

  private[graft] def ensureBucketTables(s: SparkSession, d: String): (String, String) = {
    // Serve loop: a sibling JVM's reaper can delete our tables between
    // the liveness check and the heartbeat touch (the tables are
    // reapable once idle >1h even in a live session). A failed touch
    // invalidates the memo AND the catalog entries so the next pass
    // takes the rebuild path instead of re-serving a deleted dir.
    var attempt = 0
    while (attempt < 3) {
      val entry = obtainBucketEntry(s, d)
      def touched(): Boolean =
        touchHeartbeat(s, s"orders_bj_${entry.tag}") &&
          touchHeartbeat(s, s"lineitem_bj_${entry.tag}")
      // second chance before any destructive step: tags are
      // deterministic (md5 of dir+fingerprint), so a sibling JVM that
      // reaped our tables may have already REBUILT the same names —
      // if the dirs are back, serve them rather than dropping a table
      // the sibling is actively querying
      if (touched() || touched())
        return (s"lineitem_bj_${entry.tag}", s"orders_bj_${entry.tag}")
      bucketTables.remove(d, entry)
      // dirs are (still) absent, so DROP only clears our catalog
      // entries and deletes nothing on disk; the residual window where
      // a sibling rebuilds between the re-touch and the DROP is the
      // same already-reaped TOCTOU class the reaper accepts, and the
      // rebuild path recreates the tables either way
      s.sql(s"DROP TABLE IF EXISTS orders_bj_${entry.tag}")
      s.sql(s"DROP TABLE IF EXISTS lineitem_bj_${entry.tag}")
      attempt += 1
    }
    throw new IllegalStateException(
      s"bucket tables for $d reaped concurrently 3 times in a row")
  }

  private def obtainBucketEntry(s: SparkSession, d: String): BucketEntry = {
    val fp = corpusFingerprint(s, d)
    // an entry only counts as live if the corpus is unchanged AND both
    // tables still exist in THIS session's catalog (the first builder
    // may have been a different session sharing the JVM-wide map)
    def live(e: BucketEntry): Boolean =
      e != null && e.fingerprint == fp &&
        s.catalog.tableExists(s"orders_bj_${e.tag}") &&
        s.catalog.tableExists(s"lineitem_bj_${e.tag}")
    val cur = bucketTables.get(d)
    val entry =
      if (live(cur)) cur
      else bucketTables.synchronized {
        val again = bucketTables.get(d)
        if (live(again)) again
        else {
          val superseded = Option(again).map(_.tag).toSet
          bucketTables.remove(d)
          reapStaleBucketTables(s, superseded)
          // 64-bit md5 prefix of (corpus dir, fingerprint): a 32-bit
          // String.hashCode can collide across dirs in one JVM and
          // silently serve the wrong corpus's bucket tables; folding
          // the fingerprint gives a regenerated corpus a fresh tag
          val t = java.security.MessageDigest.getInstance("MD5")
            .digest((d + "\u0000" + fp).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .take(8).map(b => f"${b & 0xff}%02x").mkString
          freshTable(s, s"orders_bj_$t")
          freshTable(s, s"lineitem_bj_$t")
          graft.sources.Sources.writeBucketed(
            Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
            s"orders_bj_$t", "o_orderkey", 8, sortCol = Some("o_orderkey"))
          graft.sources.Sources.writeBucketed(
            Tables.lineitem(s, d)
              .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
            s"lineitem_bj_$t", "o_orderkey", 8, sortCol = Some("o_orderkey"))
          val e = BucketEntry(t, fp)
          bucketTables.put(d, e)
          e
        }
      }
    entry
  }

  val qBucketJoin: Q = (s, d) => {
    val (lt, ot) = ensureBucketTables(s, d)
    s.table(lt).join(s.table(ot), Seq("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        // floor() before the integral cast on BOTH engines: Spark's
        // cast truncates toward zero, DuckDB's rounds to nearest —
        // they agree on TPC-H's integral quantities only by luck
        sum(floor(col("l_quantity")).cast("long")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  val qBucketJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- src_partitioned_scan: partition-pruned source layout ----------
  /** The 100 TB layout question: data written `partitionBy` a coarse
    * key must read back with partition PRUNING — a filter on the
    * partition column eliminates whole directories before any IO
    * (PlanAuditSpec asserts the scan's PartitionFilters carries the
    * event_type predicate). Events are re-laid-out partitioned by
    * event_type, then a single-partition read aggregates clicks per
    * hour. The rewrite uses Tables.events (µs timestamps) so the
    * round-tripped parquet is plain TIMESTAMP, not the source's NANOS.
    */
  val srcPartitionedScan: Q = (s, d) => {
    val base = System.getProperty("java.io.tmpdir") + "/graft_part_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    val src = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    src.write.mode("overwrite").partitionBy("event_type").parquet(base)
    // explicit schema: an empty corpus writes zero files and leaves
    // nothing to infer from (and production pins read schemas anyway)
    s.read.schema(src.schema).parquet(base)
      .filter(col("event_type") === "click")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("hour"))
  }

  val srcPartitionedScanSql: String =
    """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type = 'click'
      |GROUP BY 1 ORDER BY hour""".stripMargin

  // --- src_zorder_layout: Z-order clustering for 2-D data skipping ---
  /** The multi-dimension layout technique partitioning can't give:
    * interleave the bits of (custkey, order-day) into a Morton
    * z-value, sort the table by it, and BOTH single-dimension
    * predicates become range-local — a slice on either key touches a
    * handful of coarse z-tiles instead of all of them, which is what
    * lets min/max file stats skip data for either predicate on one
    * physical order. The query measures that locality directly: for
    * a custkey slice and a date slice, how many of the occupied
    * 2^17-wide coarse z-tiles hold matching rows (ONE scan with
    * conditional aggregation, integer bit math — deterministic on
    * both engines). The spec asserts each slice touches at most HALF
    * the occupied tiles; a lexicographic (custkey, date) sort would
    * put every date-slice row in every custkey run.
    */
  /** Morton interleave of two 16-bit dimension keys into a 32-bit
    * z-value — the Column form of [[zExprSpark]], shared with the
    * versioned table's OPTIMIZE rewrite (sources/VersionedTable).
    */
  private[graft] def mortonZ(zx: Column, zy: Column): Column =
    (0 until 16).map { j =>
      shiftleft(shiftright(zx, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(zy, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)

  private def zExprSpark: String =
    (0 until 16).map(j =>
      s"shiftleft(shiftright(zx, $j) & 1, ${2 * j}) + shiftleft(shiftright(zy, $j) & 1, ${2 * j + 1})")
      .mkString(" + ")

  private def zExprSql: String =
    (0 until 16).map(j =>
      s"(((zx >> $j) & 1) << ${2 * j}) + (((zy >> $j) & 1) << ${2 * j + 1})")
      .mkString(" + ")

  val srcZorderLayout: Q = (s, d) => {
    val z = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_custkey") % 65536).cast("long").as("zx"),
        (datediff(col("o_orderdate"), to_date(lit("1992-01-01"))) % 65536)
          .cast("long").as("zy"),
        col("o_orderdate"))
      .withColumn("zval", expr(zExprSpark))
      .withColumn("tile", expr("zval div 131072")) // 2^17: ~6 effective tile bits for these key widths
    val cCust = col("o_custkey").between(100, 200)
    val cDate = col("o_orderdate").between("1996-01-01", "1996-03-31")
    z.agg(
        count(lit(1)).as("n_all"), countDistinct(col("tile")).as("t_all"),
        count(when(cCust, 1)).as("n_cust"),
        countDistinct(when(cCust, col("tile"))).as("t_cust"),
        count(when(cDate, 1)).as("n_date"),
        countDistinct(when(cDate, col("tile"))).as("t_date"))
      .select(explode(array(
        struct(lit("all_rows").as("predicate"), col("n_all").as("n_rows"),
          col("t_all").as("tiles_touched")),
        struct(lit("custkey_100_200").as("predicate"), col("n_cust").as("n_rows"),
          col("t_cust").as("tiles_touched")),
        struct(lit("q1_1996").as("predicate"), col("n_date").as("n_rows"),
          col("t_date").as("tiles_touched")))).as("r"))
      .select(col("r.predicate").as("predicate"), col("r.n_rows").as("n_rows"),
        col("r.tiles_touched").as("tiles_touched"))
      .orderBy(col("predicate"))
  }

  val srcZorderLayoutSql: String =
    s"""WITH z AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate,
      |    ($zExprSql) AS zval
      |  FROM (SELECT o_orderkey, o_custkey, o_orderdate,
      |          o_custkey % 65536 AS zx,
      |          datediff('day', DATE '1992-01-01', o_orderdate) % 65536 AS zy
      |        FROM orders) t),
      |tiled AS (SELECT o_custkey, o_orderdate, zval // 131072 AS tile FROM z),
      |agg AS (
      |  SELECT COUNT(*) AS n_all,
      |    CAST(COUNT(DISTINCT tile) AS BIGINT) AS t_all,
      |    COUNT(*) FILTER (o_custkey BETWEEN 100 AND 200) AS n_cust,
      |    CAST(COUNT(DISTINCT tile)
      |      FILTER (o_custkey BETWEEN 100 AND 200) AS BIGINT) AS t_cust,
      |    COUNT(*) FILTER (o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31') AS n_date,
      |    CAST(COUNT(DISTINCT tile)
      |      FILTER (o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31') AS BIGINT) AS t_date
      |  FROM tiled)
      |SELECT * FROM (
      |  SELECT 'all_rows' AS predicate, n_all AS n_rows, t_all AS tiles_touched FROM agg
      |  UNION ALL
      |  SELECT 'custkey_100_200', n_cust, t_cust FROM agg
      |  UNION ALL
      |  SELECT 'q1_1996', n_date, t_date FROM agg) u
      |ORDER BY predicate""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_topk_group" -> qTopkGroup,
    "q_skew_join" -> qSkewJoin,
    "profile_table" -> profileTable,
    "src_format_roundtrip" -> srcFormatRoundtrip,
    "src_partitioned_scan" -> srcPartitionedScan,
    "src_zorder_layout" -> srcZorderLayout,
    "etl_schema_evolve" -> etlSchemaEvolve,
    "q_bucket_join" -> qBucketJoin)

  val oracles: Map[String, String] = Map(
    "q_topk_group" -> qTopkGroupSql,
    "q_skew_join" -> qSkewJoinSql,
    "profile_table" -> profileTableSql,
    "src_format_roundtrip" -> srcFormatRoundtripSql,
    "src_partitioned_scan" -> srcPartitionedScanSql,
    "src_zorder_layout" -> srcZorderLayoutSql,
    "etl_schema_evolve" -> etlSchemaEvolveSql,
    "q_bucket_join" -> qBucketJoinSql)
}
