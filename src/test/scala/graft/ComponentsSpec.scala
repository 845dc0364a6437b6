package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Components

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side union-find ground truth (path compression). */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // normalize: component = min id in the set
    val roots = parent.keys.map(k => k -> find(k)).toMap
    val minOf = roots.groupBy(_._2).map { case (r, kv) => r -> kv.keys.min }
    roots.map { case (k, r) => k -> minOf(r) }
  }

  /** Runs BOTH the adaptive local path and the distributed alternating-star
    * path (localThreshold = 0 forces the latter) and asserts they agree. */
  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("id_a", "id_b")
    val local = Components.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Components.connectedComponents(df, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "local union-find and distributed star paths disagree")
    local
  }

  test("path graph collapses to one component (exercises multiple rounds)") {
    val path = (1L until 64L).map(i => (i, i + 1))
    val got = run(path)
    assert(got.keySet == (1L to 64L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("disjoint clusters, stars and a triangle") {
    val pairs = Seq((10L, 2L), (10L, 7L), (2L, 7L),        // triangle, min 2
      (20L, 21L), (20L, 22L), (20L, 23L),                   // star, min 20
      (40L, 41L))                                           // pair
    assert(run(pairs) == unionFind(pairs))
  }

  test("random graphs match union-find ground truth") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 60 + trial * 20
      val pairs = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
      assert(run(pairs) == unionFind(pairs), s"trial $trial")
    }
  }

  test("string ids work and every endpoint appears exactly once (both paths)") {
    val df = Seq(("d1", "d2"), ("d2", "d3"), ("x", "y")).toDF("id_a", "id_b")
    val want = Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d1", "x" -> "x", "y" -> "x")
    for (thr <- Seq(1L << 20, 0L)) {
      val got = Components.connectedComponents(df, localThreshold = thr).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == want, s"threshold=$thr")
    }
  }

  test("empty pair list yields empty mapping") {
    val df = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponents(df).count() == 0)
  }

  test("jaccardDupGroups groups near-identical docs with sizes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "completely different text about spark catalyst expressions engine")
    ).toDF("id", "text")
    val got = Components.jaccardDupGroups(docs, "id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId.values.toSet == Set((1L, 3L)))
  }

  test("planted-pair recall holds with the df-cap BINDING (VERDICT_r03 #8)") {
    // every doc carries the same stop-phrase prefix (a hot shingle shared
    // by all 60 docs); each planted pair additionally shares discriminative
    // content. With maxDocFreq = 10 the stop-phrase shingles are dropped
    // from candidate generation, yet every planted pair must still be
    // found through its own shingles.
    val stop = "breaking news update report from the wire desk"
    val rng = new scala.util.Random(3)
    def words(k: Int) = Seq.fill(k)("w" + rng.nextInt(100000)).mkString(" ")
    val pairs = (0 until 15).map { p =>
      val body = words(12)
      (p, s"$stop $body", s"$stop $body " + words(1))
    }
    val loners = (0 until 30).map(i => (1000L + i, s"$stop ${words(12)}"))
    val docs = (pairs.flatMap { case (p, a, b) => Seq((p * 2L, a), (p * 2L + 1, b)) } ++ loners)
      .toDF("id", "text")
    // threshold 0.4: under the cap the reported jaccard is a lower bound
    // (hot common shingles excluded from BOTH common and, implicitly,
    // union — here 12/25 = 0.48 for a true 18/19 ≈ 0.95 pair)
    val grouped = Components.jaccardDupGroups(docs, "id", "text",
        n = 3, threshold = 0.4, maxDocFreq = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 15).foreach { p =>
      val (a, b) = (p * 2L, p * 2L + 1)
      assert(grouped.contains(a) && grouped(a) == grouped(b),
        s"planted pair ($a,$b) not grouped under binding cap")
    }
    assert(!grouped.keySet.exists(_ >= 1000L), "stop-phrase-only docs must not group")
  }
}
