package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DiagramOps, RegionOps}

class DiagramRegionSpec extends AnyFunSuite {
  import TestSpark._

  test("topologyStats computes counts, fanout and 2-hop reach on a known graph") {
    val spark2 = spark
    import spark2.implicits._
    // diamond: 0→1, 0→2, 1→3, 2→3 plus isolated second diagram 0→1
    val nodes = Seq(
      ("d1", 0, "VIN"), ("d1", 1, "SW"), ("d1", 2, "EN"), ("d1", 3, "OUT"),
      ("d2", 0, "GND"), ("d2", 1, "FB"),
      ("d3", 0, "BST") // nodes-only diagram: no edges at all
    ).toDF("diagram_id", "node_id", "label")
    val edges = Seq(
      ("d1", 0, 1), ("d1", 0, 2), ("d1", 1, 3), ("d1", 2, 3),
      ("d2", 0, 1)
    ).toDF("diagram_id", "src", "dst")
    val stats = DiagramOps.topologyStats(nodes, edges).collect()
      .map(r => r.getAs[String]("diagram_id") -> r).toMap
    val d1 = stats("d1")
    assert(d1.getAs[Long]("n_nodes") == 4 && d1.getAs[Long]("n_edges") == 4)
    assert(d1.getAs[Long]("max_fanout") == 2)
    assert(d1.getAs[Long]("n_reach2") == 3) // 1, 2, 3 (via either path)
    assert(d1.getAs[Long]("n_power") == 1)  // VIN
    val d2 = stats("d2")
    assert(d2.getAs[Long]("n_reach2") == 1 && d2.getAs[Long]("n_power") == 1)
    // an edgeless diagram must still appear, with zero edge stats
    val d3 = stats("d3")
    assert(d3.getAs[Long]("n_nodes") == 1 && d3.getAs[Long]("n_edges") == 0)
    assert(d3.getAs[Long]("max_fanout") == 0 && d3.getAs[Long]("n_reach2") == 0)
  }

  test("diagram type detection follows reference pattern priority") {
    val spark2 = spark
    import spark2.implicits._
    val cases = Seq(
      ("Functional Diagram of the package", "block_diagram"), // earlier pattern wins
      ("Typical application circuit", "typical_app"),
      ("Pin configuration and package", "pinout"),
      ("QFN package only", "pinout"),
      ("nothing relevant", null)
    ).toDF("page_text", "expected")
    val got = cases.withColumn("dtype", DiagramOps.detectDiagramType(col("page_text"))).collect()
    got.foreach { r =>
      assert(r.getAs[String]("dtype") == r.getAs[String]("expected"),
        s"text '${r.getAs[String]("page_text")}'")
    }
  }

  test("diagram_topology registered query returns detected diagrams only") {
    val out = DiagramOps.diagramTopology(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("block_diagram", "typical_app", "pinout")
      .contains(r.getAs[String]("dtype"))))
    assert(out.forall(r => r.getAs[Long]("n_edges") >= r.getAs[Long]("n_nodes") - 1))
  }

  test("diagram_pinout emits a typed per-pin frame for pinout diagrams only") {
    val out = DiagramOps.diagramPinout(spark, sf).collect()
    assert(out.nonEmpty)
    val fnOf = Map("VIN" -> "power_input", "GND" -> "ground", "EN" -> "enable",
      "SW" -> "switch_node", "FB" -> "feedback", "OUT" -> "output",
      "COMP" -> "compensation", "BST" -> "bootstrap")
    out.foreach { r =>
      assert(fnOf(r.getAs[String]("pin_name")) == r.getAs[String]("pin_function"),
        s"pin ${r.getAs[String]("pin_name")} mapped to ${r.getAs[String]("pin_function")}")
      assert(r.getAs[Long]("pin_id") >= 1L && r.getAs[Long]("pin_id") <= 11L)
    }
    // pin counts per diagram are contiguous 1..n (a typed frame, not a bag)
    val perDiag = out.groupBy(_.getAs[String]("diagram_id"))
    perDiag.foreach { case (id, rows) =>
      val ids = rows.map(_.getAs[Long]("pin_id")).sorted
      assert(ids.sameElements(1L to ids.max), s"$id pins not contiguous")
    }
  }

  test("diagram_appcircuit emits a typed BOM frame for typical_app diagrams only") {
    val out = DiagramOps.diagramAppCircuit(spark, sf).collect()
    assert(out.nonEmpty)
    val types = Set("inductor", "capacitor", "resistor", "diode", "ic")
    out.foreach { r =>
      assert(types.contains(r.getAs[String]("comp_type")))
      val v = r.getAs[Long]("value_code")
      assert(v >= 0L && v < 1000L)
    }
  }

  test("region_ingest proposals stay inside page bounds with valid geometry") {
    val rows = RegionOps.regionIngest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x0, y0, x1, y1) = (r.getAs[Int]("x0"), r.getAs[Int]("y0"),
        r.getAs[Int]("x1"), r.getAs[Int]("y1"))
      assert(x0 >= 0 && y0 >= 0 && x1 <= 612 && y1 <= 792 && x1 > x0 && y1 > y0)
      assert(Set("table", "figure", "text").contains(r.getAs[String]("kind")))
      val c = r.getAs[Double]("confidence")
      assert(c >= 0.5 && c < 1.0)
    }
    // deterministic: same input → same proposals
    val again = RegionOps.regionIngest(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
