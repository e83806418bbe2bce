package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOf, Dedup, DiagramOps, EtlOps, EtlOps2, EtlOps3, ExtractPipeline, GraphOps, Inference, IvfPq, MultiModal, RegionOps, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Retrain, ScaleOps, Similarity, TableAssembly, TextOps, TrainOps, TrainOps2, TrainOps3, TrainOps4, TrainOps5}
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Relational4.queries ++ Relational5.queries ++ Relational6.queries ++ AsOf.queries ++
      EtlOps.queries ++ EtlOps2.queries ++ EtlOps3.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ MultiModal.queries ++
      Inference.queries ++ TableAssembly.queries ++ DiagramOps.queries ++
      ExtractPipeline.queries ++ RegionOps.queries ++ ScaleOps.queries ++
      TrainOps.queries ++ TrainOps2.queries ++ TrainOps3.queries ++
      TrainOps4.queries ++ TrainOps5.queries ++ GraphOps.queries ++ Streaming.queries ++
      Retrain.queries ++ IvfPq.queries ++ graft.sources.VersionedTable.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++
      Relational4.oracles ++ Relational5.oracles ++ Relational6.oracles ++ AsOf.oracles ++
      EtlOps.oracles ++ EtlOps2.oracles ++ EtlOps3.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ MultiModal.oracles ++
      Inference.oracles ++ TableAssembly.oracles ++ DiagramOps.oracles ++
      ExtractPipeline.oracles ++ RegionOps.oracles ++ ScaleOps.oracles ++
      TrainOps.oracles ++ TrainOps2.oracles ++ TrainOps3.oracles ++
      TrainOps4.oracles ++ TrainOps5.oracles ++ GraphOps.oracles ++ Streaming.oracles ++
      Retrain.oracles ++ IvfPq.oracles ++ graft.sources.VersionedTable.oracles
}
