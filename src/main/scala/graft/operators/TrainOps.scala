package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C training-data pipeline operators, batch 2: corpus-statistics
  * cleaning, deterministic sampling, keyword extraction, and value
  * redaction — the remaining staples of an LLM-data pipeline, all
  * expressed as oracle-checkable deterministic dataflow.
  *
  * Scale posture: every corpus-level statistic is an aggregation whose
  * result is provably tiny (a vocabulary subset, one row per stratum,
  * a scalar), so the "join the statistic back" step is always a
  * broadcast — no second full shuffle of the corpus.
  */
object TrainOps {
  type Q = (SparkSession, String) => DataFrame

  // --- text_boilerplate: corpus-df-driven token removal ---------------
  // CCNet-style boilerplate stripping re-expressed at token granularity
  // (the synthetic docs are single-line): any token appearing in more
  // than half the documents is corpus boilerplate; documents are
  // rebuilt with those tokens dropped, order preserved, in ONE
  // filter pass per document. The boilerplate set is bounded by the
  // vocabulary (tokens with df > N/2 number at most ~2·|text|/N),
  // so it travels as a broadcast scalar array, never a shuffle.
  val textBoilerplate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"))
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val boiler = dfreq.crossJoin(total)
      .filter(col("df") * 2 > col("n_docs"))
      .agg(sort_array(collect_list(col("token"))).as("boiler"))
    docs.crossJoin(broadcast(boiler))
      .select(col("doc_id"),
        // null-doc policy: a fully-null doc behaves as '' on ALL output
        // columns (adjudicated reference semantics, _clean_cell
        // None->''), so clean_text coalesces to '' and n_removed to 0 —
        // the same values an actual ''-text row produces.
        coalesce(array_join(filter(split(col("text"), " "),
          t => !array_contains(col("boiler"), t)), " "), lit("")).as("clean_text"),
        coalesce((size(split(col("text"), " ")) -
          size(filter(split(col("text"), " "),
            t => !array_contains(col("boiler"), t)))).cast("long"), lit(0L)).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  val textBoilerplateSql: String =
    """WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      |            FROM documents),
      |dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
      |b AS (SELECT coalesce(list(token ORDER BY token), []) AS boiler
      |      FROM dfreq, (SELECT count(*) AS n_docs FROM documents)
      |      WHERE df * 2 > n_docs)
      |SELECT doc_id,
      |  coalesce(array_to_string(list_filter(string_split(text, ' '),
      |    t -> NOT list_contains(boiler, t)), ' '), '') AS clean_text,
      |  COALESCE(CAST(len(string_split(text, ' ')) -
      |       len(list_filter(string_split(text, ' '),
      |         t -> NOT list_contains(boiler, t))) AS BIGINT), 0) AS n_removed
      |FROM documents, b ORDER BY doc_id""".stripMargin

  // --- sample_stratified: deterministic hash-threshold sampling -------
  // Source-rebalancing ("data mixing") downsample: each stratum is
  // capped at CAP docs in expectation by keeping doc_id's whose md5
  // prefix falls below the stratum's fraction — reproducible across
  // runs, engines, and cluster sizes (no RNG state), and embarrassingly
  // parallel: the only aggregation is the per-stratum count (one row
  // per source), joined back by broadcast. The md5-prefix-vs-threshold
  // comparison is plain lexicographic hex compare in both engines.
  val SAMPLE_CAP = 15L

  val sampleStratified: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("frac", least(lit(1.0), lit(SAMPLE_CAP).cast("double") / col("cnt")))
      // Clamp the quantized fraction to 2^32-1: frac == 1.0 would hex to
      // 9 chars ("100000000") and lpad-TRUNCATE to a bogus "10000000"
      // threshold. Unreachable today only because the cnt <= CAP
      // disjunct shadows it — clamping keeps thresh a valid bound if
      // the two conditions are ever decoupled. (Mirrored in the oracle.)
      .withColumn("thresh",
        lpad(lower(hex(least(floor(col("frac") * 4294967296.0), lit(4294967295.0)).cast("long"))), 8, "0"))
    docs.join(broadcast(counts), "source")
      .filter(col("cnt") <= SAMPLE_CAP ||
        substring(md5(concat(col("source"), lit(":"), col("doc_id").cast("string"))), 1, 8) < col("thresh"))
      .select(col("doc_id"), col("source"), col("cnt").as("stratum_size"))
      .orderBy(col("doc_id"))
  }

  val sampleStratifiedSql: String =
    """WITH c AS (SELECT source, count(*) AS cnt,
      |             least(1.0, 15.0 / count(*)) AS frac
      |           FROM documents GROUP BY source),
      |t AS (SELECT source, cnt,
      |        lpad(lower(hex(CAST(least(floor(frac * 4294967296.0), 4294967295.0) AS BIGINT))), 8, '0') AS thresh
      |      FROM c)
      |SELECT d.doc_id, d.source, t.cnt AS stratum_size
      |FROM documents d JOIN t ON d.source = t.source
      |WHERE t.cnt <= 15
      |   OR substring(md5(concat(d.source, ':', CAST(d.doc_id AS VARCHAR))), 1, 8) < t.thresh
      |ORDER BY d.doc_id""".stripMargin

  // --- tfidf_keywords: top-3 tokens per document by TF-IDF ------------
  // Keyword extraction over corpus statistics: tf from one explode+agg,
  // df from the distinct explode, N as a broadcast scalar; the score
  // is snapped with the IEEE-exact floor(x*1e6+0.5)/1e6 formula
  // (SURVEY §6 — both engines' ln agree to well under 1e-6 on the few
  // hundred distinct (N, df) inputs). Deterministic token tiebreak.
  val tfidfKeywords: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // wide() so the tokenize+explode map work runs at session width on
    // single-split local corpora (no-op at scale) and downstream
    // branches share the explicit exchange
    val tok = Tables.wide(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    // cached: tf feeds BOTH the document-frequency aggregate and the
    // scoring join. Exchange reuse was supposed to share the
    // (doc, token) aggregation between the branches but does not fire
    // here (measured: two ~300 ms 32-task stages each re-reading the
    // text exchange and re-exploding, graft.Profile stages 234/235);
    // the cache makes the tokenize+aggregate run once. tf is bounded
    // by docs × distinct-tokens-per-doc — far smaller than the token
    // stream (the bm25Pairs discipline).
    val tf = graft.Caches.cached(
      tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
    // df derives from tf's group keys (distinct (doc,token) IS tf) — no
    // second explode+distinct shuffle of the raw token stream.
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")) * 1e6 + 0.5) / 1e6)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val tfidfKeywordsSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token),
      |dfreq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
      |         floor(tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tfidf
      |  FROM tf JOIN dfreq USING (token), n),
      |ranked AS (
      |  SELECT doc_id, token, tf, df, tfidf,
      |         CAST(row_number() OVER (PARTITION BY doc_id
      |           ORDER BY tfidf DESC, token) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT doc_id, token, tf, df, tfidf, rank FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // --- etl_redact: pattern-masking anonymization ----------------------
  /** Ordered (pattern, replacement) mask chain: emails, then phone-ish
    * digit runs with separators, then bare digit runs. Patterns stay in
    * the portable regex subset (character classes + bounded repeats —
    * no backrefs, no lookaround) so Java regex and RE2 agree.
    */
  val MASK_PATTERNS: Seq[(String, String)] = Seq(
    ("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
    ("\\+?[0-9][0-9() -]{6,}[0-9]", "[PHONE]"),
    ("[0-9]+", "[NUM]"))

  /** Mask every pattern occurrence in `c`, in chain order. */
  def maskAll(c: Column): Column =
    MASK_PATTERNS.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  val etlRedact: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val counts = MASK_PATTERNS.map { case (p, r) =>
      size(regexp_extract_all(col("props"), lit(p), lit(0)))
        .cast("long").as("n_" + r.substring(1, r.length - 1).toLowerCase)
    }
    ev.select(col("event_id") +: maskAll(col("props")).as("redacted") +: counts: _*)
      .orderBy(col("event_id"))
  }

  val etlRedactSql: String =
    """SELECT event_id,
      |  regexp_replace(regexp_replace(regexp_replace(props,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |    '\+?[0-9][0-9() -]{6,}[0-9]', '[PHONE]', 'g'),
      |    '[0-9]+', '[NUM]', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(props, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(props, '\+?[0-9][0-9() -]{6,}[0-9]')) AS BIGINT) AS n_phone,
      |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_num
      |FROM events ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_boilerplate" -> textBoilerplate,
    "sample_stratified" -> sampleStratified,
    "tfidf_keywords" -> tfidfKeywords,
    "etl_redact" -> etlRedact)

  val oracles: Map[String, String] = Map(
    "text_boilerplate" -> textBoilerplateSql,
    "sample_stratified" -> sampleStratifiedSql,
    "tfidf_keywords" -> tfidfKeywordsSql,
    "etl_redact" -> etlRedactSql)
}
