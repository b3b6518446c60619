package graft

import graft.operators.{DedupOps, SimilarityOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling evidence for the LLM-pipeline operators: times the heavy
  * pipelines on 1x/2x/4x multiples of the fixture corpus and prints a
  * seconds-per-multiple table, so the "near-linear at scale" claim is
  * measured, not asserted.
  *
  * Corpus multiplication is deterministic and must grow the corpus with
  * DISJOINT content, not duplicates: an earlier version that appended a
  * copy tag to otherwise-identical texts turned every document into a
  * member of an N-duplicate cluster, and prefix-filter candidate joins
  * are quadratic in cluster size (a shared code with document-frequency
  * df yields df² join pairs; duplication multiplies every df by N) — the
  * 4x run wedged for >12 minutes in the candidate sort-merge join. That
  * is the KNOWN duplicate-cluster pathology of AllPairs-style dedup, and
  * the production answer is exact dedup (L1) first, near-dup on unique
  * survivors; the probe's job is to measure CORPUS GROWTH, so each copy
  * rotates the alphabet (disjoint shingle space, same per-doc structure)
  * and perturbs embeddings per-dimension by copy (cross-copy cosines
  * drop below threshold instead of staying 1.0 — plain rescaling is
  * invisible to cosine and to sign-random projections).
  *
  * Usage: `sbt "runMain graft.ScaleProbe [sfDir] [maxMultiple]"`.
  */
object ScaleProbe {

  // Min of 3 runs: the host has multi-minute CPU-starvation episodes
  // (see Bench scaladoc) that would otherwise fake superlinear scaling.
  // A rep that dies (the 8x l2 rung once exhausted the host's ~80 GB of
  // spill headroom) marks the op NaN — printed as a DNF — instead of
  // killing the whole probe: the remaining ops' scaling columns are
  // still the evidence the probe exists to produce.
  private def time[A](f: => A): Double =
    try
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    catch {
      case t: Throwable =>
        System.err.println(s"[probe] op failed: ${t.getClass.getSimpleName}: " +
          s"${String.valueOf(t.getMessage).take(200)}")
        Double.NaN
    }

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private val alphabet = "abcdefghijklmnopqrstuvwxyz"

  def docsX(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { c =>
      // Rotate the alphabet per copy: per-doc shingle structure is
      // preserved, the shingle UNIVERSE is disjoint across copies.
      val rot = alphabet.drop(c % 26) + alphabet.take(c % 26)
      docs.select(
        (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
        translate(col("text"), alphabet, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))

  def embX(emb: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { c =>
      emb.select(
        (col("vec_id") + lit(c * 1000000L)).as("vec_id"),
        // Per-dimension, copy-dependent perturbation: changes the vector
        // DIRECTION (cross-copy cosines fall below near-dup thresholds),
        // unlike uniform rescaling which cosine and SRP can't see.
        zip_with(col("embedding"),
          transform(sequence(lit(0), lit(63)),
            i => lit(1.0f) + lit(0.05f * (c % 7)) * cos(i * lit(0.9))),
          (x, f) => (x * f).cast("float")).as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxX = if (args.length > 1) args(1).toInt else 4
    val spark = Engine.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")

    // Warm-up: JIT/codegen one-time costs out of the timings.
    sink(DedupOps.prefixJaccardPairs(docsX(docs, 1), 0.8))
    sink(SimilarityOps.cosinePairsLsh(embX(emb, 1), 0.9))

    println(f"${"op"}%-22s ${"x"}%3s ${"rows_in"}%10s ${"sec"}%8s")
    Iterator.from(0).map(1 << _).takeWhile(_ <= maxX).foreach { x =>
      val d = docsX(docs, x)
      val e = embX(emb, x)
      val nD = d.count(); val nE = e.count()
      val tL2 = time(sink(DedupOps.prefixJaccardPairs(d, 0.8)))
      val tL2b = time(sink(DedupOps.clusteredMinhashPairs(d, 0.8)))
      val tL7 = time(sink(DedupOps.simhash(d)))
      val tL10 = time(sink(SimilarityOps.cosinePairsLsh(e, 0.9)))
      val tL5 = time(sink(SimilarityOps.bruteTopK(e, e.filter(col("vec_id") <= 9), 5)))
      val tL16 = time(sink(DedupOps.simhashComponents(d, 1)))
      val tL14b = time(sink(DedupOps.simhashPairs(d, 3, bits = 64)))
      val tL20 = time(sink(SimilarityOps.gramMatrix(e)))
      val tL25 = time(sink(DedupOps.containmentPairs(d, 0.9)))
      val tL29 = time(sink(DedupOps.dupShingleFraction(d)))
      // The GATED l33 path (class contraction); the generic doc-graph
      // GraphOps.triangleCounts pays clique-width wedge costs by design
      // and is equivalence-tested in GraphPropSpec, not probed here.
      val tL33 = time(sink(DedupOps.simhashTriangleCounts(d, 1)))
      val tL34 = time(sink(graft.operators.LlmQueries.lmScore(d)))
      val tL35 = time(sink(DedupOps.dupWindowFraction(d)))
      println(f"l2_prefix_jaccard      $x%3d $nD%10d $tL2%8.2f")
      println(f"l2b_minhash_lsh        $x%3d $nD%10d $tL2b%8.2f")
      println(f"l7_simhash             $x%3d $nD%10d $tL7%8.2f")
      println(f"l10_srp_lsh_pairs      $x%3d $nE%10d $tL10%8.2f")
      println(f"l5_brute_topk          $x%3d $nE%10d $tL5%8.2f")
      println(f"l16_simhash_components $x%3d $nD%10d $tL16%8.2f")
      println(f"l14b_simhash64_pairs   $x%3d $nD%10d $tL14b%8.2f")
      println(f"l20_embedding_gram     $x%3d $nE%10d $tL20%8.2f")
      println(f"l25_containment        $x%3d $nD%10d $tL25%8.2f")
      println(f"l29_dup_shingle_frac   $x%3d $nD%10d $tL29%8.2f")
      println(f"l33_triangle_count     $x%3d $nD%10d $tL33%8.2f")
      println(f"l34_lm_score           $x%3d $nD%10d $tL34%8.2f")
      println(f"l35_passage_dup        $x%3d $nD%10d $tL35%8.2f")
    }
    spark.stop()
  }
}
