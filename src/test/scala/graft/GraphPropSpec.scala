package graft

import graft.operators.DedupOps
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the distributed connected-components operator: on
  * random graphs the pointer-jumping label propagation must agree with a
  * plain union-find. Raw ScalaCheck driven from ScalaTest (the bridge
  * artifact is not in the offline dependency set). Case count is small
  * (each case runs Spark rounds) but the generator covers the adversarial
  * shapes: chains (deep diameter), dense blobs, isolated nodes.
  */
class GraphPropSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  test("connectedComponents equals union-find on random graphs") {
    val genCase = for {
      n <- Gen.choose(2, 24)
      nEdges <- Gen.choose(0, 2 * n)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield (n.toLong, edges.filter(e => e._1 != e._2).distinct)

    val prop = Prop.forAllNoShrink(genCase) { case (n, edges) =>
      val nodes = (0L until n).map(i => (i, "")).toDF("doc_id", "text")
      val pairs = edges.toDF("da", "db")
      val got = DedupOps.connectedComponents(nodes, pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      got == unionFind(n, edges)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponents on a worst-case path graph (deep diameter)") {
    val n = 65L
    val nodes = (0L until n).map(i => (i, "")).toDF("doc_id", "text")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("da", "db")
    val got = DedupOps.connectedComponents(nodes, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until n).map(i => (i, 0L)).toSet)
  }
}
