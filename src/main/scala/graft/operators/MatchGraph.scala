package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STAGED MATCH-GRAPH ARTIFACT (the l64 family, round 15 — the r14
  * verdict's top item): the verified near-dup pair engine (exact-dup
  * contraction → prefix-filter candidates → exact Jaccard verify,
  * [[DedupOps.clusteredJaccardPairs]]) is the single most expensive stage
  * of the curation surface, and before this module FOUR consumers (l2
  * pairs, l50 survivorship, l57 calibration, l61 source overlap) each
  * re-ran it from the corpus — ~25–30 s of the sf0.1 bench and, at 100 TB,
  * four redundant corpus passes. A production curation stack stages
  * instead: run the pair engine ONCE, persist its verified output as a
  * durable artifact, and derive every downstream product from the
  * artifact. This is the engine-native form of the reference's own staged
  * blobs — the mapper writes shuffle output to the bucket
  * (`mapper/main.py:43-46`) and the orchestrator's reduce phase re-reads
  * it (`orchestrator/main.py:118-126`) rather than recomputing the map.
  *
  * Artifact layout (all Parquet, all MATCH-sized — bounded by the
  * verified duplication in the corpus, never corpus-quadratic):
  *   - `rep_pairs`   (da, db, jaccard): verified pairs between exact-dup
  *     representatives — the pair engine's native output.
  *   - `pairs`       (da, db, jaccard): the doc-level expansion (cluster
  *     members inherit their representative's pairs; within-cluster pairs
  *     at Jaccard 1.0) — the l2 output contract.
  *   - `components`  (doc_id, component_id): connected components of the
  *     doc-level match graph, matched docs only (a doc absent from every
  *     pair is a singleton by construction and is NOT stored).
  *
  * Components are computed on the REPRESENTATIVE graph and expanded —
  * cheaper than doc-level CC and provably equal: members of one exact
  * cluster are mutually paired (within-cluster edges), so a doc's
  * component is its representative's, and a component's min doc_id equals
  * its min rep_id (each rep IS the min doc_id of its cluster). Clusters
  * with ≥ 2 members whose rep touches no rep pair still form a component
  * (their within-cluster pairs are real match-graph edges) with
  * component_id = rep_id. `ArtifactSpec` pins from-scratch ≡ from-artifact
  * for every derived gate.
  *
  * Lifecycle: one BUILD per JVM per corpus dir ([[ensure]] memoizes;
  * [[rebuild]] — the l64 write gate — always recomputes and overwrites, so
  * every verify/bench process refreshes the artifact before any consumer
  * can read a stale one). Derived gates consume the PARQUET (a genuine
  * sink→source cycle, like the io-family roundtrips), not the lineage.
  */
object MatchGraph {

  /** Filesystem roots of one built artifact. */
  case class Artifact(repPairs: String, pairs: String, components: String)

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Artifact]()

  private def root(sfDir: String, threshold: Double, n: Int): String = {
    val tag = java.lang.Integer.toHexString(sfDir.hashCode & 0x7fffffff)
    val t = math.round(threshold * 1e6)
    s"${System.getProperty("java.io.tmpdir")}/graft-artifacts/match-t$t-n$n-$tag"
  }

  /** Read-through: build once per JVM per corpus dir, then hand every
    * caller the same on-disk artifact.
    */
  def ensure(s: SparkSession, sfDir: String, threshold: Double = 0.8,
             n: Int = 3): Artifact =
    built.computeIfAbsent(root(sfDir, threshold, n),
                          _ => build(s, sfDir, threshold, n))

  /** Force a fresh build (the l64 write gate's entry — the write IS the
    * measured operator, like io1's CSV sink).
    */
  def rebuild(s: SparkSession, sfDir: String, threshold: Double = 0.8,
              n: Int = 3): Artifact = {
    val a = build(s, sfDir, threshold, n)
    built.put(root(sfDir, threshold, n), a)
    a
  }

  private def build(s: SparkSession, sfDir: String, threshold: Double,
                    n: Int): Artifact = {
    val r = root(sfDir, threshold, n)
    val docs = Tables.load(s, sfDir, "documents")
    val h = docs.select(col("doc_id"), col("text"),
                        sha2(col("text"), 256).as("ch"))
    val clusters = h.groupBy(col("ch"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("csize"))
    // (doc_id, rep_id, csize): the exact-dup cluster map. Persisted — it
    // feeds the rep frame, both sides of the pair expansion, and the
    // component expansion.
    val members = h.join(clusters, "ch")
      .select(col("doc_id"), col("rep_id"), col("csize"))
      .persist()
    try {
      val reps = members.filter(col("doc_id") === col("rep_id"))
        .join(h.select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"), col("text"))
      // THE one pair-engine run this artifact amortizes.
      DedupOps.prefixJaccardPairs(reps, threshold, n)
        .write.mode("overwrite").parquet(s"$r/rep_pairs")
      val repPairs = s.read.parquet(s"$r/rep_pairs")

      // Doc-level expansion — the l2 output contract (cross pairs inherit
      // the rep pair's jaccard; within-cluster pairs are exact dups, 1.0).
      val ma = members.select(col("rep_id").as("da"), col("doc_id").as("ia"))
      val mb = members.select(col("rep_id").as("db"), col("doc_id").as("ib"))
      val cross = repPairs.join(ma, "da").join(mb, "db")
        .select(least(col("ia"), col("ib")).as("da"),
                greatest(col("ia"), col("ib")).as("db"), col("jaccard"))
      val within = members.as("x").join(members.as("y"),
          col("x.rep_id") === col("y.rep_id") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
                lit(1.0).as("jaccard"))
      cross.unionByName(within)
        .write.mode("overwrite").parquet(s"$r/pairs")

      // Components on the REP graph (match-sized iterative state), then
      // one broadcast-scale expansion back to docs. Isolated multi-member
      // exact clusters (rep untouched by any rep pair) are components of
      // their own with id = rep_id.
      val matchedReps = repPairs.select(col("da").as("doc_id"))
        .unionByName(repPairs.select(col("db").as("doc_id"))).distinct()
      val repComp = DedupOps.connectedComponents(
          matchedReps, repPairs.select(col("da"), col("db")))
        .select(col("doc_id").as("rep_id"), col("component_id"))
      members.join(repComp, Seq("rep_id"), "left")
        .filter(col("component_id").isNotNull || col("csize") >= 2)
        .select(col("doc_id"),
                coalesce(col("component_id"), col("rep_id"))
                  .as("component_id"))
        .write.mode("overwrite").parquet(s"$r/components")
    } finally members.unpersist(blocking = false)
    Artifact(s"$r/rep_pairs", s"$r/pairs", s"$r/components")
  }
}
