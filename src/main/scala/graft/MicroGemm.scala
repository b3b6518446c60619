package graft

import graft.operators.{MatrixGen, MatrixOps}

/** One-off dense-GEMM scaling measurement past the bench sweep's largest
  * rung — `runMain graft.MicroGemm [n ...]` times the planner-selected
  * multiply at each size with the [[MatrixOps.sweepTile]] rule (so sizes
  * past 4096 exercise the 512 tile cap + widening grid). Diagnostic main,
  * not a declared query; results are recorded in SURVEY §6.
  */
object MicroGemm {
  def main(args: Array[String]): Unit = {
    // `n` or `n@bs`: an explicit tile width for disk-envelope probes — the
    // partial-tile exchange is n³·8/bs bytes (grid·n² dense longs), so past
    // the host's free-disk ceiling the tile must widen beyond the
    // memory-derived sweepTile rule (32000² at bs=512 is 516 GB raw — the
    // round-12 DNF; bs=4000 is 64 GB).
    val sizes = (if (args.nonEmpty) args.toSeq else Seq("4000", "8000"))
      .map { s =>
        val p = s.split("@"); (p(0).toInt, if (p.length > 1) p(1).toInt else 0)
      }
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { case (n, bsArg) =>
      val bs = if (bsArg > 0) bsArg else MatrixOps.sweepTile(n)
      val t0 = System.nanoTime()
      val df = MatrixOps.multiplyPlanned(MatrixGen.matA(spark, n, n),
                                         MatrixGen.matB(spark, n, n), bs = bs)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"gemm n=$n%6d bs=$bs%4d grid=${(n + bs - 1) / bs}%3d  $dt%8.2f s")
      // GEMM_METRICS=1: per-node numOutputRows/time dump of a SECOND run
      // (its own QueryExecution — the noop sink above builds one whose
      // metrics a reused `df` would not carry) — guide §1.1's empirical
      // loop for the sweep rungs, which MetricsProbe (declared queries
      // only) cannot reach.
      if (sys.env.get("GEMM_METRICS").contains("1"))
        PlanAudit.dumpMetrics(df)
    }
    spark.stop()
  }
}
