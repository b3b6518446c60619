package graft

import org.apache.spark.sql.SparkSession

/** Per-node metrics dump for declared queries — runs each named query at
  * the given sf dir through its own QueryExecution and prints the executed
  * plan tree with numOutputRows / time metrics ([[PlanAudit.dumpMetrics]]),
  * plus wall-clock. The empirical half of guide §1.1 without the UI.
  *
  * Usage: `tools/run.sh graft.MetricsProbe <sfDir> <query> [query ...]`
  * (repeats each query twice — cold then warm — so JIT/scan-cache effects
  * are visible; metrics printed for the warm run).
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-metrics")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"\n========== $name cold=$cold%.2f s warm=$warm%.2f s ==========")
        PlanAudit.dumpMetrics(df)
      }
    }
    spark.stop()
  }
}
