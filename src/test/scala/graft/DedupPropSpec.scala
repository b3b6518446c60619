package graft

import graft.operators.DedupOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the near-dup candidate-generation paths that carry
  * a HARD no-false-negative guarantee (prefix filtering and its
  * exact-duplicate-clustered wrapper): on random corpora they must equal
  * exact all-pairs Jaccard bit-for-bit. MinHash-LSH is deliberately NOT
  * property-tested this way — its guarantee is probabilistic, and a
  * ScalaCheck-generated corpus could legitimately land on a banding miss;
  * its equivalence is pinned on fixed corpora in LlmSpec instead.
  *
  * Generator shape: small vocab + repeated phrases force HIGH background
  * similarity (the regime that defeats LSH banding and stresses the
  * prefix filter's pruning bounds), duplicates stress cluster expansion.
  */
class DedupPropSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("the", "cat", "dog", "sat", "mat", "on", "a", "big")

  test("prefix-filter and clustered near-dup equal exact all-pairs on random corpora") {
    val genDoc = for {
      n <- Gen.choose(3, 10)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val genCorpus = for {
      nDocs <- Gen.choose(4, 10)
      docs <- Gen.listOfN(nDocs, genDoc)
      // duplicate a random prefix of the corpus to exercise clustering
      nDup <- Gen.choose(0, 3)
    } yield (docs ++ docs.take(nDup)).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val genCase = for {
      corpus <- genCorpus
      t <- Gen.oneOf(0.3, 0.5, 0.8)
    } yield (corpus, t)

    val prop = Prop.forAllNoShrink(genCase) { case (rows, t) =>
      val docs = rows.toDF("doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = canon(DedupOps.jaccardPairs(docs, t))
      canon(DedupOps.prefixJaccardPairs(docs, t)) == exact &&
        canon(DedupOps.clusteredJaccardPairs(docs, t)) == exact
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }
}
