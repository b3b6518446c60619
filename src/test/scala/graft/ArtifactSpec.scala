package graft

/** The staged match-graph artifact (l64 family) must be a PURE REFACTOR
  * of the from-scratch dataflow: every derived gate's rows equal its
  * twin's exactly — pairs (l64 ↔ l2), survivorship (l64b ↔ l50), source
  * overlap (l64c ↔ l61), calibration (l64d ↔ l57). The oracle side
  * already enforces this against DuckDB (the derived gates reuse their
  * twins' oracle SQL verbatim); this spec pins the ENGINE side directly,
  * so a drift that happened to fool both oracles identically would still
  * fail here.
  */
class ArtifactSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, d).collect().map(_.toSeq.toSeq).toSeq

  private def same(artifact: String, scratch: String): Unit = {
    val a = rows(artifact)
    val s = rows(scratch)
    assert(a.nonEmpty, s"$artifact returned no rows — vacuous equality")
    assert(a == s, s"$artifact != $scratch (${a.size} vs ${s.size} rows)")
  }

  test("l64 artifact pairs read back equal the from-scratch l2 pairs") {
    same("l64_match_artifact", "l2_near_dup")
  }

  test("l64b artifact survivorship equals the from-scratch l50") {
    same("l64b_artifact_survivorship", "l50_survivorship")
  }

  test("l64c artifact source overlap equals the from-scratch l61") {
    same("l64c_artifact_source_overlap", "l61_source_overlap")
  }

  test("l64d artifact calibration equals the from-scratch l57") {
    same("l64d_artifact_calibration", "l57_minhash_calibration")
  }
}
