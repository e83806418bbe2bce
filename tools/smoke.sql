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


-- key: eval_retrieval
WITH truth AS (SELECT query_id, vec_id FROM (
WITH q AS (SELECT vec_id AS query_id,
             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS qv
           FROM embeddings WHERE vec_id < 5),
     c AS (SELECT vec_id,
             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
           FROM embeddings),
     scored AS (
       SELECT q.query_id, c.vec_id,
              CAST(aggregate(zip_with(qv, cv, (x, y) -> x * y),
                CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
       FROM q JOIN c ON c.vec_id <> q.query_id),
     ranked AS (SELECT query_id, vec_id, qdot,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
        FROM scored)
SELECT query_id, vec_id, qdot, rnk AS rank FROM ranked
WHERE rnk <= 10 ORDER BY query_id, rank) tq),
cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
WITH e AS (SELECT vec_id,
             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
           FROM embeddings),
dims AS (SELECT explode(sequence(0, 63)) AS j),
signs AS (SELECT p, dims.j,
    CASE WHEN CAST(conv(substr(md5('a_' || CAST(p AS STRING) || '_' || CAST(dims.j AS STRING)), 1, 15), 16, 10) AS BIGINT) & 1 = 1
         THEN 1 ELSE -1 END AS s
  FROM (SELECT explode(sequence(0, 7)) AS p) pp CROSS JOIN dims),
bd AS (SELECT e.vec_id, signs.p, SUM(element_at(e.cv, signs.j + 1) * signs.s) AS dot
       FROM e CROSS JOIN signs GROUP BY e.vec_id, signs.p),
bk AS (SELECT vec_id, SUM(CASE WHEN dot > 0 THEN shiftleft(1, p) ELSE 0 END) AS bucket
       FROM bd GROUP BY vec_id),
q AS (SELECT e.vec_id AS query_id, e.cv AS qv, bk.bucket AS qb
      FROM e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 5),
qp AS (SELECT query_id, qv, qb ^ f AS qbucket
       FROM q CROSS JOIN (SELECT explode(array(0, 1, 2, 4, 8, 16, 32, 64, 128)) AS f) pr),
cand AS (SELECT qp.query_id, bk.vec_id, qp.qv
         FROM qp JOIN bk ON bk.bucket = qp.qbucket
         WHERE bk.vec_id <> qp.query_id),
scored AS (SELECT c.query_id, c.vec_id,
             CAST(aggregate(zip_with(c.qv, e.cv, (x, y) -> x * y),
               CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
           FROM cand c JOIN e ON e.vec_id = c.vec_id),
rk AS (SELECT query_id, vec_id, qdot,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
       FROM scored)
SELECT query_id, vec_id, qdot, rnk AS rank FROM rk
WHERE rnk <= 10 ORDER BY query_id, rank) tc),
hits AS (SELECT c.query_id, c.cand_rank
  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id),
nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
ha AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit, min(cand_rank) AS first_rel
  FROM hits GROUP BY query_id)
SELECT nt.query_id, n_truth,
  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
  COALESCE(n_hit, CAST(0 AS BIGINT)) * 1000000 DIV n_truth AS recall_ppm,
  CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
       ELSE 1000000 DIV first_rel END AS rr_micros
FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id
;
