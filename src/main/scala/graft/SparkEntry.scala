package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-family suites:
  *   - M1–M13 matrix core           [[graft.operators.MatrixQueries]]
  *   - R1–R31 relational            [[graft.operators.RelationalQueries]]
  *   - J/S events + streaming-batch [[graft.operators.EventQueries]]
  *   - L* LLM-data-pipeline         [[graft.operators.LlmQueries]]
  *   - sql* SQL entry point         [[graft.operators.SqlQueries]]
  *   - io* source/sink + layout     [[graft.operators.IoQueries]]
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-join revenue-per-nation (R4 shape) — exercises scan, broadcast
    * joins, hash aggregate in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    RelationalQueries.queries("r4_multijoin_region")(spark, d)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MatrixQueries.queries ++ RelationalQueries.queries ++
      EventQueries.queries ++ LlmQueries.queries ++ SqlQueries.queries ++
      IoQueries.queries

  def oracleSql: Map[String, String] =
    MatrixQueries.oracles ++ RelationalQueries.oracles ++
      EventQueries.oracles ++ LlmQueries.oracles ++ SqlQueries.oracles ++
      IoQueries.oracles
}
