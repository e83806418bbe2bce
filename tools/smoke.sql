-- graft SQL-only smoke: run with tools/spark_submit_smoke.sh (or any
-- spark-sql/spark-submit session that loads the graft JAR with
--   --conf spark.sql.extensions=graft.GraftExtensions
-- ). No Scala anywhere: views are plain parquet DDL, the engine's
-- operators are SQL texts (the same gated texts SqlFrontend.sqlFor
-- serves — SmokeSqlSpec locks this file against drift), and the
-- custom kernels (simhash64, hamming64, cosine_similarity, ...) are
-- injected by the extension at session construction.
--
-- ${hivevar:dir} is the table directory, e.g. /root/testdata/sf0.01

CREATE OR REPLACE TEMPORARY VIEW lineitem
  USING parquet OPTIONS (path '${hivevar:dir}/lineitem.parquet');
CREATE OR REPLACE TEMPORARY VIEW documents
  USING parquet OPTIONS (path '${hivevar:dir}/documents.parquet');
CREATE OR REPLACE TEMPORARY VIEW embeddings
  USING parquet OPTIONS (path '${hivevar:dir}/embeddings.parquet');

-- key: q1_agg (TPC-H Q1 — the flagship relational aggregate)
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus;

-- key: q_percentiles (SqlPort Spark-dialect port)
SELECT l_returnflag,
  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS med_qty,
  CAST(ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS p90_qty,
  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS DOUBLE) AS med_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;

-- key: text_quality (corpus quality scoring over documents)
SELECT doc_id,
  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
  CASE WHEN length(text) = 0 THEN 0.0D
    ELSE CAST(size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS DOUBLE) / length(text)
  END AS punct_ratio,
  CAST(size(filter(split(text, ' '), x -> array_contains(array('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'), x))) AS DOUBLE)
    / size(split(text, ' ')) AS stopword_ratio,
  least(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.4
    + (1.0 - CASE WHEN length(text) = 0 THEN 0.0D
         ELSE CAST(size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS DOUBLE) / length(text)
       END) * 0.3
    + (CAST(size(filter(split(text, ' '), x -> array_contains(array('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'), x))) AS DOUBLE)
       / size(split(text, ' '))) * 0.3 AS quality_score
FROM documents ORDER BY doc_id;

-- key: quality_classifier (round-11 frozen logistic quality filter,
-- zero shuffles — the SQL-only face of the training-data curation gate)
WITH base AS (SELECT doc_id,
    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
  FROM documents),
feat AS (SELECT doc_id,
    CAST(size(toks) AS BIGINT) AS n_tokens,
    CASE WHEN size(toks) = 0 THEN 0.0
         ELSE CAST(aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS DOUBLE) / size(toks) END AS mean_len,
    CASE WHEN size(toks) = 0 THEN 0.0
         ELSE CAST(size(filter(toks, x -> x IN ('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) / size(toks) END AS stop_ratio,
    CASE WHEN size(toks) = 0 THEN 0.0
         ELSE CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) END AS distinct_ratio
  FROM base),
z AS (SELECT doc_id, n_tokens, mean_len, stop_ratio, distinct_ratio,
    (((-2.0 + (0.004 * n_tokens)) + (0.35 * mean_len)) + ((1.6 * stop_ratio) + (1.2 * distinct_ratio))) AS z
  FROM feat)
SELECT doc_id, n_tokens,
  CAST(floor(mean_len * 1e6 + 0.5) AS BIGINT) AS mean_len_micros,
  CAST(floor(stop_ratio * 1e6 + 0.5) AS BIGINT) AS stop_ratio_micros,
  CAST(floor(distinct_ratio * 1e6 + 0.5) AS BIGINT) AS distinct_ratio_micros,
  CAST(floor((1.0 / (1.0 + exp(-z))) * 1e6 + 0.5) AS BIGINT) AS score_micros,
  CAST(floor((1.0 / (1.0 + exp(-z))) * 1e6 + 0.5) AS BIGINT) >= 500000 AS keep
FROM z ORDER BY doc_id;

-- injected custom kernels: codegen'd expressions registered by
-- GraftExtensions under their SQL names (no Registry call needed)
SELECT doc_id,
  simhash64(split(text, ' ')) AS simhash,
  hamming64(simhash64(split(text, ' ')), simhash64(split(upper(text), ' '))) AS case_ham,
  md5_poly_fingerprint(split(text, ' ')) AS fingerprint
FROM documents ORDER BY doc_id LIMIT 10;

SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  ROUND(cosine_similarity(a.embedding, b.embedding), 6) AS cos,
  ROUND(dot_product(a.embedding, b.embedding), 6) AS dot
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 5 ORDER BY a.vec_id;
