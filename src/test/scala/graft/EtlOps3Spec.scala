package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EtlOps3Spec extends AnyFunSuite {
  import TestSpark._

  // the generator's shape, shared with the engine and the oracle SQL
  private val NR = operators.EtlOps3.NROWS
  private val NC = operators.EtlOps3.NCOLS

  test("etl_merge_positions recovers exactly the synthetic wide cells") {
    val got = SparkEntry.queries("etl_merge_positions")(spark, sf).collect()
    assert(got.nonEmpty)
    // ground truth from the generator: a cell is wide iff
    // (table + row + col) % 11 == 0, and detectable iff its content is
    // non-null, i.e. (3·table + 2·row + col) % 5 != 0
    val nDocs = Tables.documents(spark, sf).count()
    val expected = (for {
      t <- 0L until nDocs
      r <- 0L until NR
      c <- 0L until NC
      if (t + r + c) % 11 == 0 && (3 * t + 2 * r + c) % 5 != 0
    } yield (t, r, c)).toSet
    val found = got.map(x =>
      (x.getAs[Long]("table_id"), x.getAs[Long]("row_idx"), x.getAs[Long]("col_start"))).toSet
    assert(found == expected, s"missed=${expected -- found} extra=${found -- expected}")
    got.foreach { x =>
      val span = x.getAs[Long]("span")
      val kind = (x.getAs[Long]("table_id") + 2 * x.getAs[Long]("row_idx") +
        x.getAs[Long]("col_start")) % 2
      assert(span == (if (kind == 0) 2L else 3L), s"wrong span in $x")
      assert(x.getAs[Long]("col_end") == x.getAs[Long]("col_start") + span - 1)
      assert(x.getAs[Double]("confidence") == 0.9)
    }
  }

  test("etl_merge_positions is one data shuffle keyed (table, col), no join") {
    val plan = SparkEntry.queries("etl_merge_positions")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"median must not self-join:\n${plan.take(1200)}")
    assert(plan.contains("hashpartitioning(table_id"),
      s"window must shard by (table, col):\n${plan.take(1200)}")
  }

  test("etl_header_spans detects exactly the short-header tables") {
    val got = SparkEntry.queries("etl_header_spans")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    // ground truth from the generator: content is null iff
    // (3t + 2r + c) % 5 == 0; header-merge requires row 0's null at
    // col >= 1 (span 2 off the cell to its left) AND row 1 fuller
    def nullCol(t: Long, r: Long): Option[Long] =
      (0L until NC).find(c => (3 * t + 2 * r + c) % 5 == 0)
    val expected = (0L until nDocs).flatMap { t =>
      val c0 = nullCol(t, 0); val c1 = nullCol(t, 1)
      val n0 = NC - c0.size; val n1 = NC - c1.size
      c0 match {
        case Some(c) if c >= 1 && n0 < n1 => Some((t, c - 1))
        case _ => None
      }
    }.toSet
    val found = got.map(r => (r.getAs[Long]("table_id"), r.getAs[Long]("col_start"))).toSet
    assert(found == expected, s"missed=${expected -- found} extra=${found -- expected}")
    got.foreach { r =>
      assert(r.getAs[Long]("span") == 2L)
      assert(r.getAs[Double]("confidence") == 0.85)
    }
    assert(got.nonEmpty)
  }

  test("etl_merge_resolve propagates merge content exactly over its cover") {
    val rows = SparkEntry.queries("etl_merge_resolve")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs * NR * NC, "resolution must keep every cell exactly once")
    var merged = 0L
    rows.foreach { r =>
      if (r.getAs[Boolean]("was_merged")) {
        merged += 1
        assert(r.getAs[String]("resolved") != null)
      } else {
        assert(r.getAs[String]("resolved") == r.getAs[String]("content"))
      }
    }
    // exact cover: each merge covers (min(col_end, 3) - col_start + 1)
    // cells — a merge starting at the last column clips to one cell
    val expectedCover = SparkEntry.queries("etl_merge_positions")(spark, sf)
      .collect().map { m =>
        math.min(m.getAs[Long]("col_end"), NC - 1) - m.getAs[Long]("col_start") + 1
      }.sum
    assert(merged == expectedCover, s"cover $merged != expected $expectedCover")
  }

  test("etl_empty_cell_merges fires exactly on header cells with a trailing empty run") {
    val got = SparkEntry.queries("etl_empty_cell_merges")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    // ground truth from the generator: content is null iff
    // (3t + 2r + c) % 5 == 0, and the phrase is a category header for
    // residues 1 ('Electrical Characteristics', pattern hit),
    // 3 ('VIN max', alpha-ratio 6/7 > 0.8) and 4 ('Operating
    // Conditions') — residue 2 ('3.3') is not. Span = distance to the
    // next non-empty column (table edge = NC), emit iff 2..4.
    def res(t: Long, r: Long, c: Long): Long = (3 * t + 2 * r + c) % 5
    val expected = (for {
      t <- 0L until nDocs
      r <- 0L until NR
      c <- 0L until NC
      if res(t, r, c) != 0 && Set(1L, 3L, 4L).contains(res(t, r, c))
      nextC = ((c + 1) until NC).find(cc => res(t, r, cc) != 0)
      span = nextC.getOrElse(NC) - c
      if span >= 2 && span <= 4
    } yield (t, r, c, span)).toSet
    val found = got.map(x => (x.getAs[Long]("table_id"), x.getAs[Long]("row_idx"),
      x.getAs[Long]("col_start"), x.getAs[Long]("span"))).toSet
    assert(found == expected, s"missed=${(expected -- found).take(5)} extra=${(found -- expected).take(5)}")
    assert(got.nonEmpty)
    got.foreach { x =>
      assert(x.getAs[Double]("confidence") == 0.7)
      assert(x.getAs[Long]("col_end") == x.getAs[Long]("col_start") + x.getAs[Long]("span") - 1)
    }
  }

  test("etl_vision_route plan stays keyed — no cartesian, no single-partition stage") {
    val plan = SparkEntry.queries("etl_vision_route")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesianproduct"), s"cartesian:\n${plan.take(1200)}")
    assert(!plan.contains("SinglePartition"), s"serializing stage:\n${plan.take(1200)}")
  }

  test("etl_column_widths profiles exact per-column geometry") {
    val rows = SparkEntry.queries("etl_column_widths")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs * NC, "one row per (table, col)")
    rows.foreach { r =>
      val base = 40L + r.getAs[Long]("col_idx") * 10
      assert(r.getAs[Long]("n_cells") == NR)
      val typ = r.getAs[Long]("typical_w")
      assert(typ >= base - 3 && typ <= base + 3, s"median off base: $r")
      assert(r.getAs[Long]("min_w") >= base - 3)
      assert(r.getAs[Long]("max_w") <= base * 3 + 20)
      // n_wide is geometry-only: exactly the generator's wide cells
      val t = r.getAs[Long]("table_id"); val c = r.getAs[Long]("col_idx")
      val expectedWide = (0L until NR).count(rw => (t + rw + c) % 11 == 0)
      assert(r.getAs[Long]("n_wide") == expectedWide, s"wide count mismatch: $r")
    }
  }

  test("etl_vision_route: one row per table, reference confidence algebra") {
    val rows = SparkEntry.queries("etl_vision_route")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val nm = r.getAs[Long]("n_merges")
      val conf = r.getAs[Long]("merge_conf_ppm")
      val nh = r.getAs[Long]("n_high")
      val nmed = r.getAs[Long]("n_medium")
      val verify = r.getAs[Long]("verify_conf_ppm")
      if (nm == 0) assert(conf == 1000000L, s"no-merges table must score 1.0: $r")
      else assert(conf >= 700000L && conf <= 900000L, s"avg outside detector range: $r")
      assert(verify == math.max(0L, 1000000L - nh * 50000 - nmed * 25000))
      // faithful reference quirk: detector confidences are all >= 0.70,
      // so merge confidence alone can never trip the 0.60 vision gate
      assert(!r.getAs[Boolean]("needs_vision"))
      val route = r.getAs[String]("route")
      if (nh > 0) assert(route == "manual_review", s"high conflict must route to review: $r")
      else if (verify < 600000L) assert(route == "low_confidence")
      else assert(route == "auto")
    }
    // the routing must actually vary: both detectors fire and disagree
    assert(rows.exists(_.getAs[String]("route") == "manual_review"))
    assert(rows.exists(_.getAs[String]("route") == "auto"))
    assert(rows.exists(_.getAs[Long]("n_merges") > 0))
  }
}
