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
