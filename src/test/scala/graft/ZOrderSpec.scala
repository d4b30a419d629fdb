package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Z-order shard layout audit: the distributed operator must agree with
  * a from-scratch single-threaded reference (quantize -> Morton ->
  * shard -> pair census), and the layout must actually deliver locality
  * on a clustered fixture. */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  private def md5Hash48(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
  }

  test("zOrderLocalityAudit matches a from-scratch reference and beats " +
      "the hash layout on a clustered fixture") {
    import spark.implicits._
    // two tight clusters in 2-D: ids 0..19 near (10, 0), 20..39 near
    // (0, 10); within-cluster cosine ~1, across ~0
    val pts = (0L until 40L).map { i =>
      val j = (i % 20).toDouble
      if (i < 20) (i, Seq(10.0 + j * 0.05, 0.5 + j * 0.01))
      else (i, Seq(0.5 + j * 0.01, 10.0 + j * 0.05))
    }
    val df = pts.toDF("vec_id", "embedding")
    val got = Similarity.zOrderLocalityAudit(df, "vec_id", "embedding",
      dims = 2, bitsPerDim = 4, shardBits = 5, tauMilli = 700L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // ---- reference computation -------------------------------------
    val xs = pts.map(_._2.head)
    val ys = pts.map(_._2(1))
    def cells(vals: Seq[Double]): Seq[Long] = {
      val (mn, mx) = (vals.min, vals.max)
      vals.map(v => if (mx == mn) 0L
        else math.min(math.max(math.floor((v - mn) / (mx - mn) * 15), 0.0),
          15.0).toLong)
    }
    val (cx, cy) = (cells(xs), cells(ys))
    def morton(a: Long, b: Long): Long =
      (0 until 4).map(bit => (((a >> bit) & 1L) << (bit * 2)) |
        (((b >> bit) & 1L) << (bit * 2 + 1))).reduce(_ | _)
    val zShard = pts.indices.map(i => morton(cx(i), cy(i)) >> 3)
    val hShard = pts.map(p => md5Hash48(p._1) % 32)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    def audit(shard: Seq[Long]): (Long, Long, Long) = {
      val pairs = for {
        i <- pts.indices; k <- pts.indices
        if i < k && shard(i) == shard(k)
      } yield cos(pts(i)._2, pts(k)._2)
      (shard.distinct.size.toLong, pairs.size.toLong,
        pairs.count(_ * 1000 >= 700).toLong)
    }
    assert(got("zorder") == audit(zShard), s"zorder: ${got("zorder")}")
    assert(got("hash") == audit(hShard), s"hash: ${got("hash")}")
    // locality: every co-sharded z-order pair is same-cluster (clusters
    // sit in opposite Morton corners), so close-pair PURITY is total,
    // while the hash layout co-shards cross-cluster pairs too
    val (_, zp, zc) = audit(zShard)
    assert(zp == zc, "z-order co-shards only same-cluster points here")
    val (_, hp, hc) = audit(hShard)
    assert(hc < hp, "hash layout co-shards cross-cluster pairs")
  }
}
