package graft

import org.apache.spark.sql.functions._

/** Microbenchmark: native vec_dot vs the HOF zip_with+aggregate fold.
  * `sbt "runMain graft.MicroVec"` — diagnostic only.
  */
object MicroVec {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(8, 8)
    import org.apache.spark.sql.Column
    val df = spark.range(2000000).select(col("id"),
      expr("transform(sequence(0,63), i -> cast(cast(id % 97 + i as double) / 97.0d as float))").as("a"),
      expr("transform(sequence(0,63), i -> cast(cast(i + 1 as double) / 64.0d as float))").as("b")).cache()
    df.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[micro] $label ${(System.nanoTime - t0) / 1e9}%8.2f s")
    }
    def ad: Column = col("a").cast("array<double>")
    def bd: Column = col("b").cast("array<double>")
    def hof: Column = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    for (i <- 1 to 2) {
      time(s"vec_dot#$i")(df.select(call_function("vec_dot", ad, bd).as("d")).agg(sum("d")).collect())
      time(s"hof#$i")(df.select(hof.as("d")).agg(sum("d")).collect())
      time(s"vec_cos#$i")(df.select(graft.functions.VectorFunctions.cosine(col("a"), col("b")).as("d")).agg(sum("d")).collect())
    }
    spark.stop()
  }
}
