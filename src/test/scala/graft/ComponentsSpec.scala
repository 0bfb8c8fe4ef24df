package graft

import graft.operators.Components
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (operators/Components.scala): the min-label
  * propagation loop must land on the textbook transitive closure for every
  * graph shape — chains (diameter stress), cliques (the dup-cluster shape),
  * and seeded random graphs checked against a driver-side union-find. */
class ComponentsSpec extends AnyFunSuite {
  import SparkFixture._

  private def run(pairs: Seq[(Long, Long)], maxIters: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    try {
      Components.connectedComponents(pairs.toDF("a", "b"), "a", "b", maxIters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally graft.operators.ScaleOps.releaseTracked()
  }

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain: labels propagate across the full diameter") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(got == (1L to 6L).map(_ -> 1L).toMap)
  }

  test("two cliques stay separate components") {
    val got = run(Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("empty pair set yields an empty result, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Components.connectedComponents(empty, "a", "b").isEmpty)
    graft.operators.ScaleOps.releaseTracked()
  }

  test("exhausting the round budget fails loudly instead of returning wrong labels") {
    // A 12-node chain needs ~11 rounds; a 3-round budget must throw (a
    // silent return would be a wrong transitive closure), and a sufficient
    // budget must converge to the single component.
    val chain = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { run(chain, maxIters = 3) }
    assert(e.getMessage.contains("did not converge"))
    assert(run(chain, maxIters = 20) == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("auto routing: a long chain escalates to stars (converges under a budget propagation alone cannot meet)") {
    import spark.implicits._
    // A 60-link chain needs ~59 propagation rounds; with maxIters = 20 the
    // plain loop throws (pinned above), so Auto converging correctly under
    // the same budget PROVES the trajectory probe escalated to the star
    // contraction (O(log d) rounds).
    val chain = (1L until 61L).map(i => (i, i + 1))
    val got = try {
      Components.connectedComponentsAuto(
          chain.toDF("a", "b"), "a", "b", probeRounds = 4, maxIters = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally graft.operators.ScaleOps.releaseTracked()
    assert(got == (1L to 61L).map(_ -> 1L).toMap)
    // Shallow dup-cluster shape: Auto stays on propagation (converges well
    // inside the probe budget) and agrees with the plain loop + union-find.
    val cliques = Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L), (30L, 30L))
    val auto = try {
      Components.connectedComponentsAuto(cliques.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally graft.operators.ScaleOps.releaseTracked()
    assert(auto == run(cliques) && auto == unionFind(cliques))
  }

  private def runStars(pairs: Seq[(Long, Long)], maxIters: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    try {
      Components.connectedComponentsStars(pairs.toDF("a", "b"), "a", "b", maxIters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally graft.operators.ScaleOps.releaseTracked()
  }

  test("star contraction: chain, cliques, self-pair — same labels as propagation") {
    val chain = (1L until 12L).map(i => (i, i + 1))
    assert(runStars(chain) == (1L to 12L).map(_ -> 1L).toMap)
    val cliques = Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    assert(runStars(cliques) == run(cliques))
    // A node whose only pair is a self-pair must still label itself.
    assert(runStars(Seq((1L, 2L), (7L, 7L))) == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
    assert(runStars(Seq.empty).isEmpty)
  }

  test("star contraction converges in O(log d) rounds on a long chain") {
    // Diameter 96: min-propagation needs ~95 rounds; star contraction
    // must crack it within a LOGARITHMIC budget (2^10 >> 96).
    val chain = (1L until 97L).map(i => (i, i + 1))
    assert(runStars(chain, maxIters = 10) == (1L to 97L).map(_ -> 1L).toMap)
    val e = intercept[IllegalStateException] { run(chain, maxIters = 10) }
    assert(e.getMessage.contains("did not converge"))
  }

  test("property: star contraction == union-find on seeded random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen = for {
      nNodes <- Gen.choose(2, 30)
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, nNodes - 1)
        b <- Gen.choose(0, nNodes - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter(e => e._1 != e._2)
    (1 to 3).foreach { i =>
      val pairs = graphGen.pureApply(Gen.Parameters.default, Seed(100L + i))
        .distinct
      if (pairs.nonEmpty)
        assert(runStars(pairs) == unionFind(pairs), s"seed ${100 + i}")
    }
  }

  test("property: components == driver union-find on seeded random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen = for {
      nNodes <- Gen.choose(2, 30)
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, nNodes - 1)
        b <- Gen.choose(0, nNodes - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter(e => e._1 != e._2)
    (1 to 5).foreach { i =>
      val pairs = graphGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        .distinct
      if (pairs.nonEmpty) {
        val got = run(pairs)
        val exp = unionFind(pairs)
        assert(got == exp, s"seed $i: got=$got exp=$exp pairs=$pairs")
      }
    }
  }

  private def runIncr(oldPairs: Seq[(Long, Long)],
                      newPairs: Seq[(Long, Long)],
                      gate: Long = Long.MaxValue): Map[Long, Long] = {
    import spark.implicits._
    try {
      val labels = Components.connectedComponents(
        oldPairs.toDF("a", "b"), "a", "b")
      Components.incrementalComponents(labels, newPairs.toDF("a", "b"),
          "a", "b", driverGateBytes = gate)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally graft.operators.ScaleOps.releaseTracked()
  }

  test("incremental fold: merge two standing components, attach new nodes, chain through the batch") {
    // Standing: {1,2,3} and {10,11}; batch pair (3,10) must merge them,
    // (20,21) must enter as a fresh component, and (21,11) must chain the
    // fresh pair into the merged giant — all through ONE fold.
    val got = runIncr(
      oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      newPairs = Seq((3L, 10L), (20L, 21L), (21L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 1L, 21L -> 1L))
    // A new node with a SMALLER id than the standing minimum must become
    // the merged component's label (labels are min-reachable-id, not
    // first-seen).
    assert(runIncr(Seq((5L, 6L)), Seq((2L, 6L))) ==
      Map(2L -> 2L, 5L -> 2L, 6L -> 2L))
    // Empty batch: standing labels pass through untouched.
    assert(runIncr(Seq((1L, 2L), (7L, 8L)), Seq.empty) ==
      Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("property: incremental fold == backfill closure on seeded random splits") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen = for {
      nNodes <- Gen.choose(2, 30)
      nEdges <- Gen.choose(2, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, nNodes - 1)
        b <- Gen.choose(0, nNodes - 1)
      } yield (a.toLong, b.toLong))
      splitAt <- Gen.choose(0, nEdges)
    } yield (edges.filter(e => e._1 != e._2).distinct, splitAt)
    (1 to 5).foreach { i =>
      val (pairs, splitAt) = graphGen.pureApply(Gen.Parameters.default,
        Seed(500L + i))
      val (oldP, newP) = pairs.splitAt(math.min(splitAt, pairs.length))
      if (oldP.nonEmpty && pairs.nonEmpty) {
        // Both fold routes (driver union-find below the batch gate,
        // distributed propagation above it) must land on the backfill.
        val exp = unionFind(pairs)
        val gotDriver = runIncr(oldP, newP, gate = Long.MaxValue)
        assert(gotDriver == exp,
          s"seed ${500 + i} driver route: got=$gotDriver exp=$exp old=$oldP new=$newP")
        val gotDist = runIncr(oldP, newP, gate = 0L)
        assert(gotDist == exp,
          s"seed ${500 + i} distributed route: got=$gotDist exp=$exp")
      }
    }
  }
}
