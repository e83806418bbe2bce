package graft.operators

import graft.Tables
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C training-data pipeline, part 5: retrieval and span-level corpus
  * cleaning — BM25 ranked retrieval over a query set (the IR primitive
  * behind decontamination-by-retrieval and targeted curation), and
  * C4-style duplicated-passage removal (non-overlapping token windows,
  * first occurrence wins corpus-wide).
  */
object TrainOps5 {
  type Q = (SparkSession, String) => DataFrame

  private def toksOf(c: Column): Column =
    filter(split(coalesce(c, lit("")), " "), x => x =!= lit(""))

  // --- bm25_retrieval: BM25 top-5 docs per query ----------------------
  // Okapi BM25 (k1=1.2, b=0.75) over a static query set. Dataflow is
  // sized by the MATCHED tokens, not the corpus: dl (doc length) is a
  // per-row projection, N and total-token count are one scalar
  // aggregate, and the token stream is filtered against the broadcast
  // term set BEFORE any shuffle — no corpus-wide inverted index is
  // materialized (at 100 TB the tf/df shuffles carry only rows whose
  // token appears in some query). Per-term weights are computed in
  // DOUBLE with an identical operation sequence in both engines, then
  // snapped (floor(w*1e6+0.5), SURVEY §6) to integer micros BEFORE the
  // per-(query,doc) sum — integer summation is order-free, so the
  // score is bit-stable under any partitioning. Top-5 per query runs
  // through the bounded-heap TopKPerGroup physical operator
  // (≤5 rows per query cross the final shuffle).
  val BM25_QUERIES: Seq[(Long, String)] = Seq(
    1L -> "data query plan",
    2L -> "window merge batch",
    3L -> "slow scan filter",
    4L -> "customer order line",
    5L -> "stream join state",
    6L -> "hash group sort")
  private[graft] val BM25_K1 = "1.2"
  private[graft] val BM25_B = "0.75"

  val bm25Retrieval: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val qterms = BM25_QUERIES.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    val terms = qterms.select(col("term")).distinct()
    // tf per (doc, matched term); dl rides the explode so no second
    // corpus join is needed to recover it.
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .join(broadcast(terms), col("token") === col("term"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // Identical IEEE operation sequence as the DuckDB oracle text:
    // idf = ln(1.0 + (N - df + 0.5) / (df + 0.5))
    // w   = idf * ((tf * (k1+1)) / (tf + (k1 * ((1.0 - b) + ((b * dl) / avgdl)))))
    val scored = tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("t_tokens").cast("double") / col("n_docs"))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w", col("idf") * ((col("tf") * expr(s"($BM25_K1 + 1.0)")) /
        (col("tf") + (expr(BM25_K1) * ((lit(1.0) - expr(BM25_B)) +
          ((expr(BM25_B) * col("dl")) / col("avgdl")))))))
      .withColumn("w_micros", floor(col("w") * 1e6 + 0.5).cast("long"))
    val pairs = scored
      .join(broadcast(qterms), col("token") === col("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micros")).as("score_micros"),
        count(lit(1)).cast("long").as("n_terms_hit"))
    TopK.topKPerGroup(pairs, Seq("query_id"),
        Seq(("score_micros", true), ("doc_id", false)), 5)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_micros").desc, col("doc_id"))).cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micros"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  private def bm25QueryValues: String =
    BM25_QUERIES.map { case (id, t) => s"($id, '$t')" }.mkString(", ")

  val bm25RetrievalSql: String =
    s"""WITH queries(query_id, qtext) AS (VALUES $bm25QueryValues),
       |qterms AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |                  unnest(string_split(qtext, ' ')) AS term FROM queries),
       |terms AS (SELECT DISTINCT term FROM qterms),
       |docs AS (SELECT doc_id,
       |  list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |dld AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS t_tokens FROM dld),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dld) t
       |  JOIN terms ON token = term
       |  GROUP BY doc_id, token),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
       |scored AS (SELECT tf.doc_id, tf.token,
       |    CAST(floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |      ((tf * ($BM25_K1 + 1.0)) / (tf + ($BM25_K1 * ((1.0 - $BM25_B) +
       |        (($BM25_B * dl) / (CAST(t_tokens AS DOUBLE) / n_docs))))))) * 1e6 + 0.5) AS BIGINT) AS w_micros
       |  FROM tf JOIN dfreq USING (token), stats),
       |pairs AS (SELECT query_id, doc_id,
       |    CAST(sum(w_micros) AS BIGINT) AS score_micros,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit
       |  FROM scored JOIN qterms ON scored.token = qterms.term
       |  GROUP BY query_id, doc_id),
       |ranked AS (SELECT query_id, doc_id, score_micros, n_terms_hit,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micros DESC, doc_id) AS BIGINT) AS rank
       |  FROM pairs)
       |SELECT query_id, rank, doc_id, score_micros, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // --- dedup_paragraph: C4-style duplicated-window removal ------------
  // Span-LEVEL corpus cleaning with removal semantics (C4's
  // three-sentence dedup re-expressed over flat word streams):
  // each document is cut into NON-overlapping 10-token windows
  // (trailing partial window kept), every window that re-occurs
  // corpus-wide keeps only its lexicographically-first occurrence
  // (min (doc_id, idx)), and the per-doc report counts windows and
  // tokens removed. All-integer, hash-gated. Scale: one shuffle keyed
  // by window text; the keeper is min(struct(doc_id, idx)) — an
  // aggregation with map-side partial combine, so a viral passage
  // duplicated 1e8 times costs its count, never a single-task window
  // sort (the oracle uses row_number over the same ordering, identical
  // semantics at any size). dedup_substring reports overlapping-
  // shingle ppm; this operator makes the keep/drop DECISION per span.
  private[graft] val PARA_W = 10

  val dedupParagraph: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val chunks = base
      .filter(col("n") > 0)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, CAST(ceil(n / $PARA_W.0) AS INT) - 1),
           |  i -> struct(CAST(i AS BIGINT) AS idx,
           |              array_join(slice(toks, i * $PARA_W + 1, $PARA_W), ' ') AS chunk,
           |              CAST(size(slice(toks, i * $PARA_W + 1, $PARA_W)) AS BIGINT) AS ntok))""".stripMargin))
        .as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.chunk").as("chunk"),
        col("c.ntok").as("ntok"))
    val keepers = chunks.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("k"))
      .select(col("chunk"), col("k.doc_id").as("kd"), col("k.idx").as("ki"))
    val flagged = chunks.join(keepers, "chunk")
      .withColumn("kept", col("doc_id") === col("kd") && col("idx") === col("ki"))
    val perDoc = flagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"),
      sum(col("ntok")).as("n_tokens"),
      sum(when(col("kept"), col("ntok")).otherwise(0L)).as("tokens_kept"))
    val docsAll = base.select(col("doc_id"))
    docsAll.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .withColumn("removed_ppm",
        when(col("n_tokens") === 0L, 0L).otherwise(
          floor((col("n_tokens") - col("tokens_kept")) * 1000000L / col("n_tokens")).cast("long")))
      .orderBy(col("doc_id"))
  }

  val dedupParagraphSql: String =
    s"""WITH base AS (SELECT doc_id,
       |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |sized AS (SELECT doc_id, toks, len(toks) AS n FROM base),
       |chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
       |    array_to_string(toks[i * $PARA_W + 1 : i * $PARA_W + $PARA_W], ' ') AS chunk,
       |    CAST(len(toks[i * $PARA_W + 1 : i * $PARA_W + $PARA_W]) AS BIGINT) AS ntok
       |  FROM sized, UNNEST(range(0, CAST(ceil(n / $PARA_W.0) AS BIGINT))) AS u(i)
       |  WHERE n > 0),
       |flagged AS (SELECT doc_id, idx, ntok,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS occ
       |  FROM chunks),
       |per_doc AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(sum(CASE WHEN occ = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       |    CAST(sum(ntok) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN occ = 1 THEN ntok ELSE 0 END) AS BIGINT) AS tokens_kept
       |  FROM flagged GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_chunks, 0) AS n_chunks,
       |  COALESCE(n_removed, 0) AS n_removed,
       |  COALESCE(n_tokens, 0) AS n_tokens,
       |  COALESCE(tokens_kept, 0) AS tokens_kept,
       |  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0
       |       ELSE CAST(floor((n_tokens - tokens_kept) * 1000000 / n_tokens) AS BIGINT)
       |  END AS removed_ppm
       |FROM (SELECT doc_id FROM base) d LEFT JOIN per_doc USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "bm25_retrieval" -> bm25Retrieval,
    "dedup_paragraph" -> dedupParagraph)

  val oracles: Map[String, String] = Map(
    "bm25_retrieval" -> bm25RetrievalSql,
    "dedup_paragraph" -> dedupParagraphSql)
}
