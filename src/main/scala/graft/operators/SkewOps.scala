package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4.2 / 100 TB posture).
  *
  * AQE's skew-join splitting (enabled session-wide in Engine.configure)
  * handles most sort-merge-join skew at runtime by splitting oversized
  * partitions. Salting is the complementary, plan-level tool for the
  * cases AQE cannot rewrite: broadcast-ineligible joins whose SKEW IS IN
  * THE KEYS themselves (one hot key lands in one task no matter how
  * partitions split), or stages that must co-group with a downstream
  * aggregation. The cost model is explicit: the small side is
  * replicated `k`×, the hot key's rows spread across `k` tasks.
  *
  * When each applies, concretely:
  *  - **AQE split** (OptimizeSkewedJoin, proven live in `SkewAqeSpec`):
  *    the default — zero plan changes, fires at runtime from measured
  *    partition bytes, and splits a join-side partition by replicating
  *    the OTHER side's matching partition. It is join-local: the split
  *    output loses its partitioning guarantee, so a downstream
  *    aggregation on the same key re-shuffles.
  *  - **saltedJoin** (r23): when the hot rows must ALSO spread through a
  *    downstream co-keyed stage (the widened (key, salt) grouping
  *    carries through), when AQE is unavailable (stream-batch joins plan
  *    per micro-batch), or when the skew is known ahead of time and the
  *    k× small-side replication is cheaper than runtime detection.
  */
object SkewOps {

  /** Equi-join robust to heavy LEFT-side key skew: every left row gets a
    * deterministic salt in [0, k) (hash of the whole row — no rand(), so
    * plans stay reproducible), the right side is replicated k times, and
    * the join key widens to (key, salt). Result equals the plain
    * equi-join row-for-row; one hot key's probe work spreads across k
    * tasks instead of serializing into one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 k: Int): DataFrame = {
    require(k >= 1, s"salt fan-out must be >= 1, got $k")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(k)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(k - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
