package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Profile, Sharding}

/** HITS, Zipf slope, rendezvous sharding (q245–q247's operators). */
class GraphShardingSpec extends AnyFunSuite with SparkFixture {

  test("hits: one round on a 2x2 bipartite graph matches hand integer arithmetic") {
    import spark.implicits._
    val edges = Seq(("a", "x"), ("b", "x"), ("b", "y")).toDF("src", "dst")
    val S = Graph.HitsScale
    // 4 nodes, h0 = S/4 each; a1_raw: x = 2*(S/4), y = S/4, t = 3*(S/4)
    val h0 = S / 4
    val ax = (2 * h0) * S / (3 * h0)
    val ay = h0 * S / (3 * h0)
    // h1_raw: a = a(x), b = a(x)+a(y); t = 2*a(x)+a(y)
    val ha = ax * S / (2 * ax + ay)
    val hb = (ax + ay) * S / (2 * ax + ay)
    val r = Graph.hits(edges, "src", "dst", iterations = 1).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r("a")._1 === ha.toDouble / S && r("a")._2 === 0.0)
    assert(r("b")._1 === hb.toDouble / S && r("b")._2 === 0.0)
    assert(r("x")._1 === 0.0 && r("x")._2 === ax.toDouble / S)
    assert(r("y")._1 === 0.0 && r("y")._2 === ay.toDouble / S)
    // b bridges both authorities: strictly the better hub
    assert(r("b")._1 > r("a")._1)
  }

  test("hits: mass stays normalized (L1 ≈ Scale) across rounds") {
    import spark.implicits._
    val edges = (1 to 20).flatMap(i => Seq((s"u$i", s"v${i % 5}"),
      (s"u$i", s"v${(i + 1) % 5}"))).toDF("src", "dst")
    val r = Graph.hits(edges, "src", "dst", iterations = 3).collect()
    val hubSum = r.map(_.getDouble(1)).sum
    val authSum = r.map(_.getDouble(2)).sum
    // each normalize floors per node (deficit < n_nodes/Scale); the
    // 1e-12 headroom is double-summation rounding in the TEST, not mass
    assert(hubSum <= 1.0 + 1e-12 && hubSum > 1.0 - 25.0 / Graph.HitsScale)
    assert(authSum <= 1.0 + 1e-12 && authSum > 1.0 - 25.0 / Graph.HitsScale)
  }

  test("zipf slope matches a directly computed OLS on the rank census") {
    import spark.implicits._
    // freqs: "w1" x8, "w2" x4, "w3" x2, "w4" x1
    val text = (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq("w4")).mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val freqs = Seq(8.0, 4.0, 2.0, 1.0)
    val xs = freqs.indices.map(i => math.log((i + 1).toDouble))
    val ys = freqs.map(math.log)
    val n = freqs.size
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icpt = (sy - slope * sx) / n
    val r = Profile.zipfSlope(df, "text", topR = 30).head()
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) - slope) < 1e-12)
    assert(math.abs(r.getDouble(2) - icpt) < 1e-12)
  }

  test("rendezvous shard matches a brute-force md5 argmax") {
    import spark.implicits._
    val keys = (1L to 50L)
    val df = keys.toDF("k")
    val got = Sharding.rendezvousShard(df, "k", nShards = 8, outCol = "s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    keys.foreach { k =>
      val want = (0 until 8).maxBy(s => md5hex(s"$k:$s"))
      assert(got(k) === want, s"key $k")
    }
  }

  test("resharding n->n+1 moves few keys under rendezvous, most under mod") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("k")
    val r = Sharding.reshardCensus(df, "k", nFrom = 16, nTo = 17).collect()
    val n = r.map(_.getLong(1)).sum
    val moved = r.map(_.getLong(2)).sum
    val movedMod = r.map(_.getLong(3)).sum
    assert(n === 2000L)
    // expectation 1/17 ~ 5.9%; allow generous noise
    assert(moved < n / 8, s"rendezvous moved $moved")
    // mod rehash moves ~16/17 ~ 94%
    assert(movedMod > n * 8 / 10, s"mod moved $movedMod")
  }

  test("labelPropagation: hand-stepped two rounds on bridged triangles, " +
      "synchronized semantics, partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // triangles {1,2,3} and {4,5,6} bridged by 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("s", "d")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Graph.labelPropagation(df, "s", "d", rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(edges)
    // hand-stepped: r1 = min neighbor (all counts 1); r2 majority with
    // min tie-break: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 3L, 6L -> 3L), got.toString)
    assert(got == run(edges.repartition(16, col("d"))))
    // one round: everyone takes the smallest neighbor id
    val r1 = graft.operators.Graph.labelPropagation(edges, "s", "d", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 4L, 6L -> 4L), r1.toString)
  }
}
