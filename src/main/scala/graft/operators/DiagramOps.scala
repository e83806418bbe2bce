package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-structured diagram extraction output — re-expresses the
  * reference's ExtractedDiagram model (interfaces.py:86: nodes/edges
  * topology per diagram) and DiagramExtractor._detect_diagram_type
  * (extractor_v03.py:307 DIAGRAM_PATTERNS, first match wins).
  *
  * The topology lives in two long-form frames — nodes(diagram_id,
  * node_id, label) and edges(diagram_id, src, dst) — and every query
  * over it is an equi-join keyed on diagram_id, so the quadratic work
  * is bounded per diagram and the shuffle key is the diagram: the same
  * bucket-local discipline as the dedup operators. Reachability is
  * bounded-hop (explicit join per hop), not an unbounded fixpoint —
  * the right shape for "is OUT fed from VIN"-style datasheet checks.
  */
object DiagramOps {
  type Q = (SparkSession, String) => DataFrame

  /** DIAGRAM_PATTERNS in reference order (first match wins). */
  private val diagramPatterns = Seq(
    "block\\s*diagram" -> "block_diagram",
    "functional\\s*diagram" -> "block_diagram",
    "typical\\s*application" -> "typical_app",
    "application\\s*circuit" -> "typical_app",
    "pin\\s*configuration" -> "pinout",
    "package" -> "pinout")

  /** _detect_diagram_type: first matching pattern, else NULL. */
  def detectDiagramType(pageText: Column): Column = {
    val l = lower(pageText)
    diagramPatterns.foldRight(lit(null).cast("string"): Column) {
      case ((pat, dtype), elseCol) => when(l.rlike(pat), dtype).otherwise(elseCol)
    }
  }

  /** Per-diagram topology stats over generic nodes/edges frames:
    * node/edge counts, max fan-out, nodes reachable from node 0 within
    * 2 hops, and power-rail node count. One aggregation per stat, one
    * join per hop, all keyed on diagram_id.
    */
  def topologyStats(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val nN = nodes.groupBy(col("diagram_id")).agg(
      count(lit(1)).as("n_nodes"),
      sum(when(col("label").isin("VIN", "GND"), 1L).otherwise(0L)).as("n_power"))
    val nE = edges.groupBy(col("diagram_id")).agg(count(lit(1)).as("n_edges"))
    val fan = edges.groupBy(col("diagram_id"), col("src")).agg(count(lit(1)).as("deg"))
      .groupBy(col("diagram_id")).agg(max(col("deg")).as("max_fanout"))
    val hop1 = edges.filter(col("src") === 0).select(col("diagram_id"), col("dst"))
    val hop2 = hop1.as("h").join(edges.as("e"),
        col("h.diagram_id") === col("e.diagram_id") && col("h.dst") === col("e.src"))
      .select(col("h.diagram_id").as("diagram_id"), col("e.dst").as("dst"))
    val reach = hop1.unionByName(hop2).filter(col("dst") =!= 0).distinct()
      .groupBy(col("diagram_id")).agg(count(lit(1)).as("n_reach2"))
    // left joins: a nodes-only diagram (no edges at all) must still
    // appear, with zero edge stats
    nN.join(nE, Seq("diagram_id"), "left")
      .join(fan, Seq("diagram_id"), "left")
      .join(reach, Seq("diagram_id"), "left")
      .na.fill(0L, Seq("n_edges", "max_fanout", "n_reach2"))
  }

  private val nodeLabels =
    Seq("VIN", "GND", "EN", "SW", "FB", "OUT", "COMP", "BST")

  /** Deterministic caption injection + type detection over documents —
    * the shared front half of every diagram query (the synthetic stand-
    * in for page rasters this container can't decode).
    */
  private def detectedDocs(s: SparkSession, d: String): DataFrame = {
    val caption = element_at(
      array(Seq("block diagram", "functional diagram", "typical application",
        "application circuit", "pin configuration", "package").map(lit): _*),
      (pmod(col("doc_id"), lit(6)) + 1).cast("int"))
    Tables.documents(s, d)
      .withColumn("page_text",
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(caption, lit(" "), col("text"))).otherwise(col("text")))
      .withColumn("dtype", detectDiagramType(col("page_text")))
      .filter(col("dtype").isNotNull)
  }

  /** diagram_topology: synthetic per-document diagrams (deterministic
    * caption injection → type detection, chain + shortcut edges) run
    * through topologyStats. Fully mirrored in DuckDB.
    */
  val diagramTopology: Q = (s, d) => {
    val diag = detectedDocs(s, d)
      .withColumn("n", (pmod(col("doc_id"), lit(5)) + 3).cast("int"))
      .select(concat(lit("diag_p"), col("doc_id")).as("diagram_id"),
        col("doc_id"), col("dtype"), col("n"))
    val nodes = diag.select(col("diagram_id"), col("doc_id"),
        explode(sequence(lit(0), col("n") - 1)).as("node_id"))
      .withColumn("label", element_at(
        array(nodeLabels.map(lit): _*),
        (pmod(col("doc_id") + col("node_id"), lit(8)) + 1).cast("int")))
      .select(col("diagram_id"), col("node_id"), col("label"))
    val chain = diag.select(col("diagram_id"), col("n"),
        explode(sequence(lit(0), col("n") - 2)).as("src"))
      .select(col("diagram_id"), col("src"), (col("src") + 1).as("dst"))
    val shortcuts = diag.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("diagram_id"), lit(0).as("src"), (col("n") - 1).as("dst"))
      .unionByName(diag.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("diagram_id"), lit(1).as("src"), (col("n") - 1).as("dst")))
    val edges = chain.unionByName(shortcuts).distinct()
    diag.select(col("diagram_id"), col("dtype"))
      .join(topologyStats(nodes, edges), "diagram_id")
      .orderBy(col("diagram_id"))
  }

  val diagramTopologySql: String = {
    // joined without margin pipes: this is substituted AFTER stripMargin
    val detCase = diagramPatterns.map { case (pat, t) =>
      s"WHEN regexp_matches(lower(page_text), '$pat') THEN '$t'"
    }.mkString("\n         ")
    """WITH base AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0
      |         THEN ['block diagram','functional diagram','typical application','application circuit','pin configuration','package'][CAST(doc_id % 6 AS INT) + 1] || ' ' || text
      |         ELSE text END AS page_text
      |  FROM documents),
      |diag AS (
      |  SELECT 'diag_p' || doc_id AS diagram_id, doc_id,
      |    CASE DETCASE
      |         ELSE NULL END AS dtype,
      |    CAST(doc_id % 5 + 3 AS INT) AS n
      |  FROM base
      |  WHERE dtype IS NOT NULL),
      |nodes AS (
      |  SELECT diagram_id, i AS node_id,
      |    ['VIN','GND','EN','SW','FB','OUT','COMP','BST'][CAST((doc_id + i) % 8 AS INT) + 1] AS label
      |  FROM diag, LATERAL unnest(generate_series(0, n - 1)) t(i)),
      |edges AS (
      |  SELECT diagram_id, i AS src, i + 1 AS dst
      |  FROM diag, LATERAL unnest(generate_series(0, n - 2)) t(i)
      |  UNION
      |  SELECT diagram_id, 0, n - 1 FROM diag WHERE doc_id % 3 = 0
      |  UNION
      |  SELECT diagram_id, 1, n - 1 FROM diag WHERE doc_id % 4 = 0),
      |hop1 AS (SELECT diagram_id, dst FROM edges WHERE src = 0),
      |reach AS (
      |  SELECT diagram_id, COUNT(*) AS n_reach2 FROM (
      |    SELECT diagram_id, dst FROM hop1
      |    UNION
      |    SELECT h.diagram_id, e.dst FROM hop1 h JOIN edges e
      |      ON h.diagram_id = e.diagram_id AND h.dst = e.src) u
      |  WHERE dst <> 0 GROUP BY diagram_id)
      |SELECT d.diagram_id, d.dtype,
      |  (SELECT COUNT(*) FROM nodes nd WHERE nd.diagram_id = d.diagram_id) AS n_nodes,
      |  (SELECT CAST(COALESCE(SUM(CASE WHEN label IN ('VIN','GND') THEN 1 ELSE 0 END), 0) AS BIGINT)
      |     FROM nodes nd WHERE nd.diagram_id = d.diagram_id) AS n_power,
      |  (SELECT COUNT(*) FROM edges e WHERE e.diagram_id = d.diagram_id) AS n_edges,
      |  (SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM edges e
      |     WHERE e.diagram_id = d.diagram_id GROUP BY src) f) AS max_fanout,
      |  COALESCE(r.n_reach2, 0) AS n_reach2
      |FROM diag d LEFT JOIN reach r ON d.diagram_id = r.diagram_id
      |ORDER BY d.diagram_id""".stripMargin
      .replace("DETCASE", detCase)
  }

  // --- diagram_pinout: typed pinout payload frame ---------------------
  // vision_client.py:415 extract_pinout (PINOUT_DIAGRAM prompt): the
  // reference asks the vision model for per-pin rows. The model call
  // itself is the stubbed external kernel; the typed output contract —
  // (diagram_id, pin_id, pin_name, pin_function), one row per pin,
  // partition-parallel per diagram — is real and, with a deterministic
  // stub payload, sits fully under the hash gate (mm_metadata
  // discipline).
  private val pinFunctions: Seq[(String, String)] = Seq(
    "VIN" -> "power_input", "GND" -> "ground", "EN" -> "enable",
    "SW" -> "switch_node", "FB" -> "feedback", "OUT" -> "output",
    "COMP" -> "compensation", "BST" -> "bootstrap")

  val diagramPinout: Q = (s, d) => {
    val fn = pinFunctions.foldRight(lit(""): Column) { case ((k, v), rest) =>
      when(col("pin_name") === k, v).otherwise(rest)
    }
    detectedDocs(s, d).filter(col("dtype") === "pinout")
      .select(concat(lit("diag_p"), col("doc_id")).as("diagram_id"), col("doc_id"),
        explode(sequence(lit(1), (pmod(col("doc_id"), lit(8)) + 4).cast("int")))
          .as("pin_id"))
      .withColumn("pin_id", col("pin_id").cast("long"))
      .withColumn("pin_name", element_at(array(nodeLabels.map(lit): _*),
        (pmod(col("doc_id") + col("pin_id"), lit(8)) + 1).cast("int")))
      .withColumn("pin_function", fn)
      .select(col("diagram_id"), col("pin_id"), col("pin_name"), col("pin_function"))
      .orderBy(col("diagram_id"), col("pin_id"))
  }

  /** Shared caption-injection + type-detection CTE body (the SQL
    * mirror of detectedDocs), parameterized by the wanted dtype —
    * one source of truth for all three diagram oracles.
    */
  private def detectedDocsSqlBody(wantType: String): String = {
    val detCase = diagramPatterns.map { case (pat, t) =>
      s"WHEN regexp_matches(lower(page_text), '$pat') THEN '$t'"
    }.mkString("\n         ")
    s"""base AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0
      |         THEN ['block diagram','functional diagram','typical application','application circuit','pin configuration','package'][CAST(doc_id % 6 AS INT) + 1] || ' ' || text
      |         ELSE text END AS page_text
      |  FROM documents),
      |diag AS (
      |  SELECT 'diag_p' || doc_id AS diagram_id, doc_id,
      |    CASE $detCase
      |         ELSE NULL END AS dtype
      |  FROM base
      |  WHERE dtype = '$wantType')""".stripMargin
  }

  val diagramPinoutSql: String = {
    val fnCase = pinFunctions.map { case (k, v) =>
      s"WHEN pin_name = '$k' THEN '$v'"
    }.mkString("\n       ")
    s"""WITH ${detectedDocsSqlBody("pinout")},
      |pins AS (
      |  SELECT diagram_id, doc_id, CAST(i AS BIGINT) AS pin_id
      |  FROM diag, LATERAL unnest(generate_series(1, CAST(doc_id % 8 + 4 AS INT))) t(i)),
      |named AS (
      |  SELECT diagram_id, pin_id,
      |    ['VIN','GND','EN','SW','FB','OUT','COMP','BST'][CAST((doc_id + pin_id) % 8 AS INT) + 1] AS pin_name
      |  FROM pins)
      |SELECT diagram_id, pin_id, pin_name,
      |  CASE $fnCase ELSE '' END AS pin_function
      |FROM named ORDER BY diagram_id, pin_id""".stripMargin
  }

  // --- diagram_appcircuit: typed application-circuit BOM frame --------
  // vision_client.py:427 extract_application_circuit
  // (TYPICAL_APPLICATION prompt): the payload is the circuit's bill of
  // materials — (diagram_id, comp_id, comp_type, value_code), one row
  // per component. Same stub-payload/hash-gated-contract discipline as
  // diagram_pinout.
  private val compTypes = Seq("inductor", "capacitor", "resistor", "diode", "ic")

  val diagramAppCircuit: Q = (s, d) =>
    detectedDocs(s, d).filter(col("dtype") === "typical_app")
      .select(concat(lit("diag_p"), col("doc_id")).as("diagram_id"), col("doc_id"),
        explode(sequence(lit(1), (pmod(col("doc_id"), lit(5)) + 2).cast("int")))
          .as("comp_id"))
      .withColumn("comp_id", col("comp_id").cast("long"))
      .select(col("diagram_id"), col("comp_id"),
        element_at(array(compTypes.map(lit): _*),
          (pmod(col("doc_id") + col("comp_id"), lit(compTypes.length)) + 1).cast("int"))
          .as("comp_type"),
        pmod(col("doc_id") * 7 + col("comp_id") * 13, lit(1000L)).as("value_code"))
      .orderBy(col("diagram_id"), col("comp_id"))

  val diagramAppCircuitSql: String = {
    val typeArr = compTypes.map(t => s"'$t'").mkString(",")
    s"""WITH ${detectedDocsSqlBody("typical_app")},
      |comps AS (
      |  SELECT diagram_id, doc_id, CAST(i AS BIGINT) AS comp_id
      |  FROM diag, LATERAL unnest(generate_series(1, CAST(doc_id % 5 + 2 AS INT))) t(i))
      |SELECT diagram_id, comp_id,
      |  [$typeArr][CAST((doc_id + comp_id) % ${compTypes.length} AS INT) + 1] AS comp_type,
      |  (doc_id * 7 + comp_id * 13) % 1000 AS value_code
      |FROM comps ORDER BY diagram_id, comp_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "diagram_topology" -> diagramTopology,
    "diagram_pinout" -> diagramPinout,
    "diagram_appcircuit" -> diagramAppCircuit)
  val oracles: Map[String, String] = Map(
    "diagram_topology" -> diagramTopologySql,
    "diagram_pinout" -> diagramPinoutSql,
    "diagram_appcircuit" -> diagramAppCircuitSql)
}
