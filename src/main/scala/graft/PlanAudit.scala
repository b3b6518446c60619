package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for representative
  * declared queries and flags the scale anti-patterns the design forbids —
  * scans without pushed filters/pruned columns where expected, missing
  * broadcasts on dim joins, interpreted (non-codegen) hot paths.
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir] [query ...]"`.
  * Output is for eyeballing + the round log; the assertions live in the
  * grep summary lines (`[audit]`).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set(
      "r1_filter_project", "r4_multijoin_region", "r9_window_topk",
      "m1_matmul", "m4_matmul_sparse", "l2_near_dup", "l5_vector_topk",
      "l6_label_centroids", "l10_cosine_dup", "l11_fingerprint",
      "s6_interval_join", "s7_asof_join", "r20_pivot", "l12_bpe_tokens",
      "io3_partitioned_scan", "io4_bucketed_join",
      "r22_ntile", "s9_gapfill", "j2_props_map", "l14_simhash_pairs",
      "l17_tfidf", "l18_array_hof", "sql5_correlated")
    val spark = Engine.configure(
      SparkSession.builder().master("local[8]").appName("graft-audit")
        .config("spark.sql.shuffle.partitions", 8)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.toSeq.sorted.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val df = fn(spark, sfDir)
        // Execute THIS df's own QueryExecution first (a sink write would
        // plan a separate execution): under AQE the pre-execution plan is
        // a bare AdaptiveSparkPlan skeleton — codegen stages, final join
        // strategies, and coalesced exchanges only exist in the final
        // plan. toRdd.foreach runs it without driver materialization.
        df.queryExecution.toRdd.foreach(_ => ())
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // Formatted mode carries no codegen annotation in Spark 4; the
        // executed-plan string marks codegen stages with `*(n)` prefixes.
        val simple = df.queryExecution.executedPlan.toString
        println(s"\n========== $name ==========")
        println(plan)
        def has(s: String) = plan.contains(s)
        val flags = Seq(
          "PushedFilters" -> has("PushedFilters: ["),
          "WholeStageCodegen" -> simple.contains("*("),
          "BroadcastHashJoin" -> has("BroadcastHashJoin"),
          "CartesianProduct(!)" -> has("CartesianProduct"),
          "SortMergeJoin" -> has("SortMergeJoin"))
        println(s"[audit] $name " + flags.map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
