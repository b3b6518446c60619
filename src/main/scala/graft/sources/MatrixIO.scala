package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Dense-matrix I/O in the reference's interchange format: a JSON
  * array-of-arrays (row-major) per matrix — the exact storage the
  * reference loads (`orchestrator/main.py:58-64`,
  * `np.array(json.loads(blob))`) and writes back
  * (`orchestrator/main.py:22-39`, `result_matrix.json`).
  *
  * Read path is fully declarative: wholetext scan → `from_json` to
  * `ARRAY<ARRAY<BIGINT>>` → double `posexplode` to COO `(i, j, v)`.
  * This format is for reference-compatible ingestion of small dense
  * operands; at 100 TB the engine's storage format is COO Parquet
  * (partitionable, prunable, splittable — a single JSON blob is none of
  * those), which every other source in the engine uses.
  */
object MatrixIO {

  private val denseSchema = ArrayType(ArrayType(LongType))

  /** Dense JSON array-of-arrays file → COO DataFrame (i, j, v). */
  def readDenseJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), denseSchema).as("m"))
      .select(posexplode(col("m")).as(Seq("i", "v_row")))
      .select(col("i").cast("long").as("i"), posexplode(col("v_row")).as(Seq("j", "v")))
      .select(col("i"), col("j").cast("long").as("j"), col("v"))

  /** COO DataFrame → dense row-major JSON (the reference's assemble,
    * `orchestrator/main.py:22-39`: zero-fill + cell placement + single
    * JSON blob). Missing cells are zero-filled. Driver-side by design —
    * the output is a single small JSON artifact; `maxCells` guards
    * against misuse on at-scale results (which stay COO Parquet).
    */
  def writeDenseJson(coo: DataFrame, rows: Long, cols: Long, path: String,
                     maxCells: Long = 10_000_000L): Unit = {
    require(rows * cols <= maxCells,
      s"dense JSON sink is for small matrices (${rows}x$cols > $maxCells cells); use COO Parquet")
    // Distributed densify: one output row per matrix row, columns packed
    // in order with zero-fill via a position join on a range.
    val grid = coo.sparkSession.range(rows).select(col("id").as("i"))
      .crossJoin(coo.sparkSession.range(cols).select(col("id").as("j")))
    val dense = grid.join(coo, Seq("i", "j"), "left_outer")
      .select(col("i"), col("j"), coalesce(col("v"), lit(0L)).as("v"))
      .groupBy("i")
      .agg(array_sort(collect_list(struct(col("j"), col("v")))).as("cells"))
      .select(col("i"), transform(col("cells"), c => c.getField("v")).as("row"))
      .orderBy("i")
      .select(concat(lit("["), array_join(col("row"), ","), lit("]")).as("line"))
      .collect()
    val body = dense.iterator.map(_.getString(0)).mkString("[", ",", "]")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
