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
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4000, 8000)
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      val bs = MatrixOps.sweepTile(n)
      val t0 = System.nanoTime()
      MatrixOps.multiplyPlanned(MatrixGen.matA(spark, n, n),
                                MatrixGen.matB(spark, n, n), bs = bs)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"gemm n=$n%6d bs=$bs%4d grid=${(n + bs - 1) / bs}%3d  $dt%8.2f s")
    }
    spark.stop()
  }
}
