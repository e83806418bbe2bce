package graft.operators

import graft.Tables
import graft.functions.Expr
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2C text analysis over `documents` — language-ID, quality scoring,
  * token counting, fingerprinting. All per-row logic is native
  * functions (codegen'd) or our single-pass custom expressions, so the
  * plans stay embarrassingly parallel: no shuffle until the optional
  * final ORDER BY, which the correctness gate needs but a 100 TB
  * pipeline would drop.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(c, " ")

  // --- text_tokens: whitespace + BPE-ish regex counting -------------
  private val bpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  val textTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit(bpePattern)).cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  val textTokensSql: String =
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS bpe_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_calc,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- text_quality: length / punct / stopword ratios ----------------
  private val stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is")

  val textQuality: Q = (s, d) => {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val stopHits = size(filter(t, x => x.isin(stopwords: _*))).cast("double")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("double")
    val len = length(col("text")).cast("double")
    val lenScore = least(lit(1.0), len / 500.0)
    // ANSI division raises on len = 0 (empty document — a row real
    // crawls always contain); define the empty doc as punct-free
    val punctRatio = when(len === 0.0, lit(0.0)).otherwise(punct / len)
    val stopRatio = stopHits / nTok
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        punctRatio.as("punct_ratio"),
        stopRatio.as("stopword_ratio"),
        (lenScore * 0.4 + (lit(1.0) - punctRatio) * 0.3 + stopRatio * 0.3).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val textQualitySql: String = {
    val sw = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CASE WHEN length(text) = 0 THEN 0.0
      |    ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text)
      |  END AS punct_ratio,
      |  CAST(len(list_filter(string_split(text, ' '), x -> list_contains($sw, x))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stopword_ratio,
      |  least(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.4
      |    + (1.0 - CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text)
      |       END) * 0.3
      |    + (CAST(len(list_filter(string_split(text, ' '), x -> list_contains($sw, x))) AS DOUBLE)
      |       / len(string_split(text, ' '))) * 0.3 AS quality_score
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  // --- text_langid: stopword-profile argmax heuristic ----------------
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "que"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une", "du"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "den"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和"))

  val textLangid: Q = (s, d) => {
    val t = toks(col("text"))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(t, array(words.map(lit): _*))).cast("long")
    }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, sc)) =>
      when(acc.isNull && sc === best, lang).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("doc_id") +: col("lang").as("lang_actual") +:
        scores.map { case (l, sc) => sc.as(s"score_$l") } :+ pred.as("lang_pred"): _*)
      .orderBy(col("doc_id"))
  }

  val textLangidSql: String = {
    def arr(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scoreExprs = langProfiles.map { case (l, ws) =>
      s"CAST(len(list_intersect(string_split(text, ' '), ${arr(ws)})) AS BIGINT) AS score_$l"
    }.mkString(",\n  ")
    // same first-wins argmax chain as the Spark plan
    val caseChain = langProfiles.map { case (l, _) =>
      s"WHEN score_$l = best THEN '$l'"
    }.mkString(" ")
    s"""WITH scored AS (
      |  SELECT doc_id, lang AS lang_actual,
      |  $scoreExprs
      |  FROM documents),
      |withbest AS (
      |  SELECT *, greatest(score_en, score_es, score_fr, score_de, score_zh) AS best FROM scored)
      |SELECT doc_id, lang_actual, score_en, score_es, score_fr, score_de, score_zh,
      |  CASE $caseChain END AS lang_pred
      |FROM withbest ORDER BY doc_id""".stripMargin
  }

  // --- text_fingerprint: rolling hash + simhash (custom exprs) -------
  val textFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        Expr.rollingHash(toks(col("text"))).as("fingerprint"),
        Expr.simhash64(toks(col("text"))).as("simhash"))
      .orderBy(col("doc_id"))

  // --- text_fingerprint_exact: md5-Horner fingerprint twin ------------
  // rollingHash (xxhash64 Karp–Rabin) is rows-only by nature; this is
  // its dedup_simhash_exact-style twin: the same order-sensitive
  // polynomial fold, but over per-token md5 values in mod-(2^31-1)
  // arithmetic, where every intermediate fits a BIGINT in both
  // engines — DuckDB reproduces the value bit-for-bit via
  // list_reduce, putting the fingerprint operator class under the
  // hash gate.
  val textFingerprintExact: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        Expr.md5PolyFingerprint(toks(col("text"))).as("fingerprint"))
      .orderBy(col("doc_id"))

  val textFingerprintExactSql: String =
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    [CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647
      |      FOR t IN string_split(text, ' ')]),
      |    (a, h) -> (a * 1000003 + h) % 2147483647) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- text_entropy: character-entropy quality signal ----------------
  // Shannon entropy of the per-doc character distribution — the
  // standard cheap detector for low-information text (keyboard mash,
  // repeated boilerplate, base64 blobs score far from prose's ~4.2
  // bits/char). Shuffle-free per-row math in ONE codegen'd sorted-run
  // pass (Expr.charEntropy / Kernels.charEntropy): sort the char array
  // once, accumulate run lengths, flush a -p·log2(p) term at every run
  // boundary — O(n log n) per doc in compiled code, vs the naive
  // O(distinct × n) per-distinct-char lambda rescan (measured ~10x out
  // of family at sf0.1 full materialization before the rewrite; the
  // QuantVec/LongDotProduct precedent — interpreted higher-order
  // lambdas cost 5x+ on the same plan). Run boundaries of the sorted
  // array appear in sorted-distinct order and the kernel mirrors
  // Spark's Log2 arithmetic (StrictMath.log ratio), so the summation
  // order — and the IEEE result — is IDENTICAL to the oracle's
  // sorted-distinct fold; the final entropy is quantized
  // floor(x*1e6+0.5)/1e6 on both sides (SURVEY §6 rule: never compare
  // raw transcendentals). Empty-string chars are filtered because
  // Spark's split("", "") yields [""] while DuckDB yields [].
  val textEntropy: Q = (s, d) => {
    val chars = filter(split(col("text"), ""), c => c =!= "")
    val ent = graft.functions.Expr.charEntropy(chars)
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(chars).cast("long").as("n_chars_tot"),
        size(array_distinct(chars)).cast("long").as("n_distinct"),
        (floor(ent * 1e6 + 0.5) / 1e6).as("entropy"))
      .orderBy(col("doc_id"))
  }

  val textEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    [ch FOR ch IN string_split(text, '') IF ch != ''] AS chars
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, chars, list_sort(list_distinct(chars)) AS dchars
      |  FROM c)
      |SELECT doc_id,
      |  CAST(len(chars) AS BIGINT) AS n_chars_tot,
      |  CAST(len(dchars) AS BIGINT) AS n_distinct,
      |  floor(list_reduce(list_prepend(0.0, [
      |      -(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
      |        * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / len(chars))
      |      FOR ch IN dchars]), (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS entropy
      |FROM d ORDER BY doc_id""".stripMargin

  // --- pipe_clean_corpus: the end-to-end training-data clean ---------
  // quality filter → language filter → exact dedup, composed from the
  // operators above in one declarative plan (what a 100 TB corpus
  // clean actually runs): no intermediate materialization, one
  // aggregation shuffle at the dedup.
  val pipeCleanCorpus: Q = (s, d) => {
    val t = toks(col("text"))
    val stopHits = size(filter(t, x => x.isin(stopwords: _*))).cast("double")
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(t, array(words.map(lit): _*))).cast("long")
    }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, sc)) =>
      when(acc.isNull && sc === best, lang).otherwise(acc)
    }
    // NO wide() here, deliberately: the tokenize + intersect + md5
    // chain is a single-task map at local scale (357 ms profiled), but
    // spreading it was MEASURED a net loss twice (back-to-back A/B
    // 0.651 s unwidened vs 0.767 s widened) — the exchange write runs
    // at the scan's own 1-task width and costs more than the kernel
    // serialization it removes. At scale the scan has >= width splits
    // and the kernel parallelizes for free (the mm_phash_dedup rule).
    Tables.documents(s, d)
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("stop_ratio", stopHits / col("n_tokens"))
      .filter(col("n_tokens") >= 30 && col("stop_ratio") > 0)
      .filter(pred === "en")
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .groupBy(md5(col("norm")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"),
        min(col("n_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_dups"))
      .orderBy(col("doc_id"))
  }

  val pipeCleanCorpusSql: String = {
    val sw = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    def arr(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scoreExprs = langProfiles.map { case (l, ws) =>
      s"CAST(len(list_intersect(string_split(text, ' '), ${arr(ws)})) AS BIGINT) AS score_$l"
    }.mkString(",\n    ")
    val caseChain = langProfiles.map { case (l, _) => s"WHEN score_$l = best THEN '$l'" }.mkString(" ")
    s"""WITH scored AS (
      |  SELECT doc_id, text,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(string_split(text, ' '), x -> list_contains($sw, x))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS stop_ratio,
      |    $scoreExprs
      |  FROM documents),
      |flagged AS (
      |  SELECT *, greatest(score_en, score_es, score_fr, score_de, score_zh) AS best FROM scored),
      |kept AS (
      |  SELECT doc_id, text, n_tokens FROM flagged
      |  WHERE n_tokens >= 30 AND stop_ratio > 0 AND (CASE $caseChain END) = 'en')
      |SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens, COUNT(*) AS n_dups
      |FROM kept
      |GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_entropy" -> textEntropy,
    "text_fingerprint" -> textFingerprint,
    "text_fingerprint_exact" -> textFingerprintExact,
    "pipe_clean_corpus" -> pipeCleanCorpus)

  /** text_fingerprint is hash-function-specific → rows-only check. */
  val oracles: Map[String, String] = Map(
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_entropy" -> textEntropySql,
    "text_fingerprint_exact" -> textFingerprintExactSql,
    "pipe_clean_corpus" -> pipeCleanCorpusSql)
}
