package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkFixture {

  test("cosine of parallel vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(2.0, 0.0), Seq(0.0, 3.0))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("codegen'd cosine matches the declarative HOF formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 50).map(_ => Seq.fill(64)(rnd.nextGaussian()))
    val df = vecs.zip(vecs.reverse).toDF("a", "b")
    val pairs = df.select(
      Similarity.cosine(col("a"), col("b")).as("fast"),
      Similarity.cosineDeclarative(col("a"), col("b")).as("slow")).collect()
    // identical left-to-right accumulation order => bit-identical doubles
    pairs.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("bruteForceTopK returns the k nearest by cosine, self excluded") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0)),  // closest to 0
      (2L, Seq(0.5, 0.5, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0)),
      (4L, Seq(-1.0, 0.0, 0.0))) // farthest
    val corpus = vecs.toDF("vec_id", "v")
    val probes = corpus.where(col("vec_id") === 0L)
    val out = Similarity.bruteForceTopK(corpus, probes, "vec_id", "v", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq == Seq(1L, 2L))
  }

  test("FastHash.srpBucket matches the declarative SRP formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(Seq(0.5, -1.2, 3.3, 0.0), Seq(-2.0, 0.1, 0.0, 9.9)).toDF("v")
    for (t <- 0 until 3) {
      val fast = df.select(graft.functions.FastHash.srpBucket(col("v"), t, 12))
        .collect().map(_.getLong(0)).toSeq
      val slow = df.select(Similarity.srpBucket(col("v"), t, 12))
        .collect().map(_.getLong(0)).toSeq
      assert(fast == slow, s"table $t")
    }
  }

  private lazy val clustered = {
    import spark.implicits._
    // deterministic synthetic corpus: two clusters around orthogonal axes
    val rnd = new scala.util.Random(42)
    (0L until 60L).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.0, 0.0, 0.0) else Array(0.0, 1.0, 0.0, 0.0)
      (i, base.map(_ + rnd.nextGaussian() * 0.05).toSeq)
    }.toDF("vec_id", "v")
  }

  private lazy val bfBaseline: Set[(Long, Long)] = {
    val probes = clustered.where(col("vec_id") < 3)
    Similarity.bruteForceTopK(clustered, probes, "vec_id", "v", 5)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("lshTopK achieves high recall vs brute force on clustered data") {
    val probes = clustered.where(col("vec_id") < 3)
    val lsh = Similarity.lshTopK(clustered, probes, "vec_id", "v", 5, tables = 8, planes = 6)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bfBaseline intersect lsh).size.toDouble / bfBaseline.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("ivfTopK achieves high recall vs brute force on clustered data") {
    val probes = clustered.where(col("vec_id") < 3)
    val ivf = Similarity.ivfTopK(clustered, probes, "vec_id", "v", 5,
      nCells = 8, nProbe = 4)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bfBaseline intersect ivf).size.toDouble / bfBaseline.size
    assert(recall >= 0.8, s"recall $recall too low")
    // determinism: same cells, same result
    val again = Similarity.ivfTopK(clustered, probes, "vec_id", "v", 5,
      nCells = 8, nProbe = 4)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == again)
  }

  test("knnJoin at saturation equals the brute-force k-NN graph") {
    val knn = Similarity.knnJoin(clustered, "vec_id", "v", k = 3,
      nCells = 6, nProbe = 6)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(clustered, clustered, "vec_id", "v", 3)
      .select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knn == bf)
    // every vector is a probe: one k-NN list per corpus vector
    assert(knn.map(_._1).size == clustered.count())
  }

  test("ivfTopKWith refined centroids at saturation equals brute force") {
    import spark.implicits._
    val init = Similarity.seedCentroids(clustered, "vec_id", "v", 6)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val refined = Similarity.kmeansRefine(clustered, "v", init, iters = 2)
    val centroids = refined.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid")
    val probes = clustered.where(col("vec_id") < 3)
    val ivf = Similarity.ivfTopKWith(clustered, probes, "vec_id", "v",
      centroids, k = 5, nProbe = 6)
      .select("probe_id", "rank", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bf = Similarity.bruteForceTopK(clustered, probes, "vec_id", "v", 5)
      .select("probe_id", "rank", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == bf)
  }

  test("kmeansRefine recovers planted cluster directions from perturbed seeds") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val anchors = Seq(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))
    val data = (0 until 300).map { i =>
      val a = anchors(i % 3)
      (i.toLong, a.map(x => x + rnd.nextGaussian() * 0.05))
    }.toDF("vec_id", "v")
    // seeds: one noisy point from each cluster
    val init = anchors.indices.map(c =>
      (c.toLong, anchors(c).map(x => x + rnd.nextGaussian() * 0.3))).toArray
    val refined = Similarity.kmeansRefine(data, "v", init, iters = 5)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // each refined centroid aligns with its anchor far better than the seed
    refined.foreach { case (cell, c) =>
      val anchor = anchors(cell.toInt)
      assert(cos(c, anchor) > 0.99,
        s"cell $cell cos ${cos(c, anchor)}")
      assert(cos(c, anchor) >= cos(init(cell.toInt)._2, anchor) - 1e-9)
    }
    // stability: rerun agrees to float-merge-order tolerance (double
    // addition is not associative; partial-agg merge order may vary)
    val again = Similarity.kmeansRefine(data, "v", init, iters = 5)
    refined.zip(again).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("int8 quantization: codes bounded, error under one bucket, degenerate dims stable") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0, 5.0, 7.0)),
      (2L, Seq(1.0, 5.0, -3.0)),
      (3L, Seq(0.5, 5.0, 2.0))).toDF("vec_id", "v")
    val rows = Similarity.quantizeInt8(df, "vec_id", "v")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    // dim ranges: [0,1], [5,5] (degenerate), [-3,7]
    rows.values.foreach { r =>
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      assert(codes.forall(c => c >= 0 && c <= 255), codes)
      assert(codes(1) == 0, "degenerate dim codes to 0")
      val v = r.getAs[scala.collection.Seq[Double]]("v")
      val recon = r.getAs[scala.collection.Seq[Double]]("recon")
      assert(recon(1) == 5.0, "degenerate dim reconstructs exactly")
      // midpoint dequantization: error <= half a bucket per live dim
      v.indices.filter(_ != 1).foreach { i =>
        val width = if (i == 0) 1.0 / 256 else 10.0 / 256
        assert(math.abs(v(i) - recon(i)) <= width / 2 + 1e-12,
          s"dim $i ${v(i)} vs ${recon(i)}")
      }
      assert(r.getAs[Double]("max_abs_err") <= 10.0 / 512 + 1e-12)
    }
    // max values land in the top bucket, mins in the bottom
    assert(rows(2L).getAs[scala.collection.Seq[Int]]("codes")(0) == 255)
    assert(rows(1L).getAs[scala.collection.Seq[Int]]("codes")(0) == 0)
    assert(rows(1L).getAs[scala.collection.Seq[Int]]("codes")(2) == 255)
    assert(rows(2L).getAs[scala.collection.Seq[Int]]("codes")(2) == 0)
  }

  test("integerGram matches the naive driver-side Gram on every cell") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(8)(rng.nextInt(256))))
    val df = vecs.toDF("vec_id", "codes")
    val got = Similarity.integerGram(df, "codes", dims = 8)
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        r.getAs[Long]("gram")).toMap
    assert(got.size == 36)
    for (i <- 0 until 8; j <- i until 8) {
      val want = vecs.map { case (_, v) => v(i).toLong * v(j) }.sum
      assert(got((i, j)) == want, s"cell ($i,$j)")
    }
    // order-insensitivity: partitioning must not change any integer cell
    val re = Similarity.integerGram(df.repartition(7), "codes", dims = 8)
      .collect().map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        r.getAs[Long]("gram")).toMap
    assert(re == got)
  }

  test("powerIterationTop finds a planted dominant direction") {
    import spark.implicits._
    // codes concentrated on dims 0/1 with 2:1 amplitude: the dominant
    // eigenvector of the second-moment matrix points along dim 0
    val vecs = (0 until 200).map { i =>
      val a = 100 + (i % 7)
      Tuple1(Array(2 * a, a, i % 3, (i * 7) % 5))
    }
    val df = vecs.toDF("codes")
    val v = Similarity.powerIterationTop(df, "codes", dims = 4, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v(0L) == 1.0, "max-|x| component is normalized to exactly 1")
    assert(math.abs(v(1L) - 0.5) < 0.01, s"dim1 loading ${v(1L)}")
    assert(math.abs(v(2L)) < 0.1 && math.abs(v(3L)) < 0.1)

    // partition-stability: Gram is integer-exact, driver fold is fixed
    val re = Similarity.powerIterationTop(df.repartition(9), "codes", 4, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(re == v)
  }

  test("hardNegatives skips same-label neighbors however close they are") {
    import spark.implicits._
    // probe 0 (label 1): vec 1 is nearly identical but SAME label —
    // must be skipped; vec 2 (label 2) is the true hard negative even
    // though vec 3 (label 2) is more distant
    val rows = Seq(
      (0L, Seq(1.0, 0.0), 1),
      (1L, Seq(0.999, 0.01), 1),
      (2L, Seq(0.9, 0.1), 2),
      (3L, Seq(0.0, 1.0), 2)).toDF("vec_id", "v", "label")
    val out = Similarity.hardNegatives(rows, rows.where($"vec_id" === 0),
      "vec_id", "v", "label", k = 2).collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq == Seq(2L, 3L))
    assert(out.forall(_.getAs[Int]("neg_label") == 2))
  }

  test("pq: codes are valid, identical vectors share codes, adist self-consistent") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = IndexedSeq.tabulate(40)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
    // vector 100 is an exact copy of vector 0
    val data = (base :+ (100L, base(0)._2)).toDF("vec_id", "v")
    val cb = Similarity.pqCodebookRow(data, "vec_id", "v", ksub = 4)
    val enc = Similarity.pqEncode(data, "vec_id", "v", cb, m = 4, ksub = 4)
    val codes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 4)))
    assert(codes(100L) === codes(0L), "identical vectors must share codes")
    // ADC: the exact copy of probe 0 shares its codes, so its adist is
    // exactly 0 and it sits in the leading zero-distance tie group
    // (other vectors may legitimately collide into the same PQ cell —
    // 4 subspaces x 4 codes is only 256 cells)
    val top = Similarity.pqAdcTopK(enc, data.where($"vec_id" === 0L),
        "vec_id", "v", cb, m = 4, ksub = 4, k = 3)
      .orderBy($"rank").collect()
    assert(top.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    val copyRow = top.find(_.getLong(1) == 100L)
    assert(copyRow.isDefined && copyRow.get.getDouble(2) == 0.0,
      s"copy must surface with adist 0, got ${top.toSeq}")
    assert(top.map(_.getDouble(2)).toSeq.sorted == top.map(_.getDouble(2)).toSeq)
  }

  test("pq codegen kernel is bit-identical to the declarative HOF encode") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val data = IndexedSeq.tabulate(60)(i =>
      (i.toLong, Seq.fill(12)(rnd.nextGaussian()))).toDF("vec_id", "v")
    val cb = Similarity.pqCodebookRow(data, "vec_id", "v", ksub = 5)
    def codesOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2).toSeq).toMap
    val kernel = codesOf(Similarity.pqEncode(data, "vec_id", "v", cb, m = 4, ksub = 5))
    val decl = codesOf(Similarity.pqEncodeDeclarative(
      data, "vec_id", "v", cb, m = 4, ksub = 5))
    assert(kernel === decl)
    // the ADC kernel agrees with a driver-side replay of the fold
    val enc = Similarity.pqEncode(data, "vec_id", "v", cb, m = 4, ksub = 5)
    val out = Similarity.pqAdcTopK(enc, data.where($"vec_id" === 3L),
        "vec_id", "v", cb, m = 4, ksub = 5, k = 60)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val cbv = cb.collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getSeq[Double](1).toArray).toArray
    val probe = data.where($"vec_id" === 3L).collect().head.getSeq[Double](1).toArray
    def l2(a: Array[Double], b: Array[Double], off: Int, len: Int) = {
      var d = 0.0; var t = 0
      while (t < len) { val x = a(off + t) - b(off + t); d += x * x; t += 1 }
      d
    }
    val dt = Array.tabulate(4, 5)((s, j) => l2(probe, cbv(j), s * 3, 3))
    kernel.foreach { case (id, codes) =>
      if (id != 3L) {
        var exp = 0.0
        codes.zipWithIndex.foreach { case (c, s) => exp += dt(s)(c) }
        assert(out(id) == exp, s"adist mismatch for $id")
      }
    }
  }

  test("pq recall: ADC top-1 finds near neighbors planted in a clustered corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 4 well-separated cluster centers; members jitter tightly around
    // them, so PQ codes cluster and ADC keeps same-cluster vectors close
    val centers = IndexedSeq.fill(4)(Seq.fill(8)(rnd.nextGaussian() * 10))
    val data = IndexedSeq.tabulate(80)(i => (i.toLong,
      centers(i % 4).map(_ + rnd.nextGaussian() * 0.01))).toDF("vec_id", "v")
    val cb = Similarity.pqCodebookRow(data, "vec_id", "v", ksub = 8)
    val enc = Similarity.pqEncode(data, "vec_id", "v", cb, m = 4, ksub = 8)
    val probes = data.where($"vec_id" < 4)
    val top1 = Similarity.pqAdcTopK(enc, probes, "vec_id", "v", cb,
        m = 4, ksub = 8, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every probe's nearest-by-ADC neighbor is from its own cluster
    top1.foreach { case (p, c) =>
      assert(c % 4 == p % 4, s"probe $p matched cross-cluster $c")
    }
  }

  test("mutualNearestNeighbors: mutual pairs only, hubs suppressed") {
    import spark.implicits._
    // a1<->b1 and a2<->b2 are mutual; a3 is a satellite whose best is b1,
    // but b1's best is a1 -> a3 must NOT pair (the hub suppression)
    val a = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("id", "v")
    val b = Seq((10L, Seq(1.0f, 0.05f)), (20L, Seq(0.05f, 1.0f)))
      .toDF("id", "v")
    val got = Similarity.mutualNearestNeighbors(a, b, "id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("mutualNearestNeighbors: integer dots are partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    def mk(n: Int, off: Int) = (1 to n).map(i =>
      ((i + off).toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("id", "v")
    val (a, b) = (mk(60, 0), mk(60, 1000))
    def run(x: org.apache.spark.sql.DataFrame) =
      Similarity.mutualNearestNeighbors(x, b, "id", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(a.repartition(1)) == run(a.repartition(32, $"id")))
  }

  test("silhouetteByLabel: tight clusters score ~1, straddlers negative") {
    import spark.implicits._
    // a and b: tight, far apart; c: its two points sit ON a and b
    val rows = Seq(
      (1L, "a", Seq(0.0f, 0.0f)), (2L, "a", Seq(0.0f, 0.000002f)),
      (3L, "b", Seq(1.0f, 0.0f)), (4L, "b", Seq(1.0f, 0.000002f)),
      (5L, "c", Seq(0.0f, 0.0f)), (6L, "c", Seq(1.0f, 0.0f)))
    val df = rows.toDF("id", "lab", "v")
    val got = Similarity.silhouetteByLabel(df, "id", "v", "lab")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a")._3 > 0.9 && got("b")._3 > 0.9)
    assert(got("a")._2 == 2 && got("b")._2 == 2, "all home points closer home")
    assert(got("c")._3 < -0.9, "straddler cluster scores deeply negative")
    assert(got("c")._2 == 0)
  }

  test("silhouetteByLabel: single label yields null mean, loudly") {
    import spark.implicits._
    val df = Seq((1L, "a", Seq(0.0f, 0.0f)), (2L, "a", Seq(1.0f, 1.0f)))
      .toDF("id", "lab", "v")
    val r = Similarity.silhouetteByLabel(df, "id", "v", "lab").collect().head
    assert(r.isNullAt(3), "no rival centroid -> null mean, not a fake 0")
  }

  test("silhouetteByLabel: partitioning-invariant (decimal mean)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      val lab = i % 4
      (i.toLong, lab, Seq.tabulate(8)(d =>
        (lab * 2.0 + rnd.nextDouble() * 0.5 + d * 0.01).toFloat))
    }
    val df = rows.toDF("id", "lab", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.silhouetteByLabel(d, "id", "v", "lab")
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    assert(run(df.repartition(1)) == run(df.repartition(32, $"id")))
  }

  test("centroidCosines: orthogonal/diagonal centroids score 0 and " +
      "1/sqrt(2); scale cancels; zero centroid nulls") {
    import spark.implicits._
    val rows = Seq(
      ("A", Seq(1.0f, 0.0f)), ("A", Seq(1.0f, 0.0f)),
      ("B", Seq(0.0f, 1.0f)),
      ("C", Seq(1.0f, 1.0f)),
      ("D", Seq(5.0f, 0.0f)), // A scaled by 5: same direction
      ("Z", Seq(0.0f, 0.0f)))
    val got = Similarity.centroidCosines(rows.toDF("label", "embedding"),
        "label", "embedding")
      .collect().map(r => (r.getAs[String]("label_a"),
        r.getAs[String]("label_b")) -> Option(r.getAs[Double]("cosine")))
      .toMap
    assert(got(("A", "B")).get == 0.0)
    assert(math.abs(got(("A", "C")).get - 1.0 / math.sqrt(2.0)) < 1e-6)
    assert(got(("A", "D")).get == 1.0, "scale must cancel")
    assert(got(("A", "Z")).isEmpty, "zero centroid -> null, not NaN")
    // n counts ride along
    val na = Similarity.centroidCosines(rows.toDF("label", "embedding"),
        "label", "embedding")
      .where($"label_a" === "A" && $"label_b" === "B")
      .head().getAs[Long]("n_a")
    assert(na == 2L)
  }

  test("mmrSelect: top pick is pure relevance, an exact duplicate of " +
      "it is deferred behind a diverse moderately-relevant vector") {
    import spark.implicits._
    // query (3,1); a=(1,0) rel ~.949 (id 1), b = dup of a (id 2),
    // c=(0,1) rel ~.316 orthogonal to a. lambda=0.5: round 2 scores
    // b at .5(.949-1) < 0 and c at .5(.316-0) > 0 -> c before b
    val cands = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val q = Seq(Tuple1(Seq(3L, 1L))).toDF("qv")
    val out = graft.operators.Similarity.mmrSelect(cands, "id", "v",
      q, "qv", k = 3, lambda = 0.5, scale = 1L)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L, 2L),
      out.mkString(", "))
    assert(math.abs(out(0).getAs[Double]("rel") - 3.0 / math.sqrt(10)) < 1e-12)
    // the duplicate's selection score carries the full redundancy hit
    assert(out(2).getAs[Double]("score") < 0.0)
    // rank-1 score = lambda * rel (ms starts at 0)
    assert(out(0).getAs[Double]("score") ===
      0.5 * out(0).getAs[Double]("rel"))
  }

  test("jlDistortion: ratios concentrate near 1 on the real embedding " +
      "table; identical pairs are counted degenerate, not divided") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Similarity.jlDistortion(
        emb, "vec_id", "embedding", outDims = 16, pairOffset = 100L)
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Long]("ratio_bin"))
      .toMap
    // E[ratio] = 1 (bin 1000); with k=16 the deciles stay well inside
    // a generous band and must straddle the median sensibly
    assert(out(0.5) > 300 && out(0.5) < 2500, out.toString)
    assert(out(0.1) <= out(0.5) && out(0.5) <= out(0.9))
    // a planted duplicate pair: dv = 0 -> degenerate, never divided
    val dup = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 0.0f)),
      (101L, Seq(1.0f, 2.0f)), (102L, Seq(4.0f, 1.0f))).toDF("id", "v")
    val d = graft.operators.Similarity.jlDistortion(
        dup, "id", "v", outDims = 4, pairOffset = 100L)
      .collect()
    assert(d.forall(_.getAs[Long]("n_degenerate") == 1L), d.mkString(", "))
    assert(d.forall(_.getAs[Long]("n_pairs") == 1L))
  }

  test("kCenterSeeds: farthest-point order on a planted line; ties " +
      "break by id; selection distances are the radius certificate") {
    import spark.implicits._
    // points on a line at 0, 1, 10, 21 (ids 1..4): anchor id 1 (min
    // id), then 21 (dist 21), then 10 (min-dist 10 vs 11 -> 10... )
    val pts = Seq((1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(10.0f)),
      (4L, Seq(21.0f))).toDF("id", "v")
    val out = graft.operators.Similarity
      .kCenterSeeds(pts, "id", "v", k = 3, scale = 1L)
      .orderBy("seed_rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 4L, 3L),
      out.mkString(", "))
    assert(out(0).isNullAt(out(0).fieldIndex("dist2")))
    assert(out(1).getAs[Long]("dist2") == 21L * 21L)
    // at selection 3: min-dists were {0, 1, 100, 0} -> picks id 3 at 100
    assert(out(2).getAs[Long]("dist2") == 100L)
    // exact ties: equidistant duplicates resolve to the smaller id
    val tie = Seq((1L, Seq(0.0f)), (2L, Seq(5.0f)), (3L, Seq(5.0f)))
      .toDF("id", "v")
    val t = graft.operators.Similarity
      .kCenterSeeds(tie, "id", "v", k = 2, scale = 1L)
      .orderBy("seed_rank").collect()
    assert(t(1).getAs[Long]("id") == 2L)
  }

  test("calinskiHarabasz: matches the ANOVA-identity local reference; " +
    "tighter separation raises CH; single label nulls") {
    import spark.implicits._
    def run(rows: Seq[(Int, Seq[Float])]) =
      graft.operators.Similarity.calinskiHarabasz(
        rows.toDF("label", "embedding"), "label", "embedding").head()
    val rows = Seq(
      (0, Seq(1.0f, 1.0f)), (0, Seq(1.0f, 3.0f)),
      (1, Seq(9.0f, 9.0f)), (1, Seq(9.0f, 11.0f)))
    val r = run(rows)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("k") == 2 &&
      r.getAs[Long]("dims") == 2)
    // local double reference
    val pts = rows.map { case (l, v) => (l, v.map(_.toDouble)) }
    val byL = pts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cents = byL.view.mapValues(vs =>
      vs.transpose.map(c => c.sum / vs.size).toSeq).toMap
    val grand = pts.map(_._2).transpose.map(c => c.sum / pts.size).toSeq
    val ssw = pts.map { case (l, v) =>
      v.zip(cents(l)).map { case (x, m) => (x - m) * (x - m) }.sum }.sum
    val ssb = byL.map { case (l, vs) =>
      vs.size * cents(l).zip(grand)
        .map { case (m, g) => (m - g) * (m - g) }.sum }.sum
    val ch = (ssb / 1.0) / (ssw / 2.0)
    assert(math.abs(r.getAs[Double]("ssw") - ssw) < 1e-6)
    assert(math.abs(r.getAs[Double]("ssb") - ssb) < 1e-6)
    assert(math.abs(r.getAs[Double]("ch") - ch) < 1e-6 * ch,
      s"ch=${r.getAs[Double]("ch")} ref=$ch")
    // closer clusters -> smaller CH
    val closer = rows.map { case (l, v) =>
      (l, if (l == 1) v.map(_ - 6.0f) else v) }
    assert(run(closer).getAs[Double]("ch") < r.getAs[Double]("ch"))
    // one label: k = 1 -> null
    val one = run(rows.map { case (_, v) => (7, v) })
    assert(one.isNullAt(one.fieldIndex("ch")))
  }

  test("daviesBouldin: symmetric two-cluster hand value; merging " +
    "clusters raises DB; single label nulls") {
    import spark.implicits._
    def run(rows: Seq[(Int, Seq[Float])]) =
      graft.operators.Similarity.daviesBouldin(
        rows.toDF("label", "embedding"), "label", "embedding").head()
    val rows = Seq(
      (0, Seq(1.0f, 1.0f)), (0, Seq(1.0f, 3.0f)),
      (1, Seq(9.0f, 9.0f)), (1, Seq(9.0f, 11.0f)))
    val r = run(rows)
    // s_0 = s_1 = 1 (points 1 away from centroid); d = sqrt(128)
    val ref = (1.0 + 1.0) / math.sqrt(128.0)
    assert(math.abs(r.getAs[Double]("db") - ref) < 1e-9,
      s"db=${r.getAs[Double]("db")} ref=$ref")
    val closer = rows.map { case (l, v) =>
      (l, if (l == 1) v.map(_ - 6.0f) else v) }
    assert(run(closer).getAs[Double]("db") > r.getAs[Double]("db"))
    val one = run(rows.map { case (_, v) => (7, v) })
    assert(one.isNullAt(one.fieldIndex("db")))
  }

  test("productQuantize: codebook rows encode to their own rank with " +
      "zero error; codes bounded; err equals a naive reference; " +
      "indivisible dims refused loudly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble() * 10 - 5)))
    val df = rows.toDF("id", "v")
    val out = Similarity.productQuantize(df, "id", "v", nSub = 4, nCodes = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    // naive reference: codebook = 6 smallest ids' subvectors
    val cb = rows.sortBy(_._1).take(6).map(_._2)
    def dist(v: Array[Double], c: Array[Double], m: Int): Double =
      (0 until 2).map(i => math.pow(v(m * 2 + i) - c(m * 2 + i), 2)).sum
    for ((id, v) <- rows) {
      val (codes, err) = out(id)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 6))
      val refCodes = (0 until 4).map(m =>
        (0 until 6).minBy(j => dist(v, cb(j), m)))
      assert(codes == refCodes, s"id $id: $codes vs $refCodes")
      val refErr = (0 until 4).map(m => dist(v, cb(codes(m)), m)).sum
      assert(math.abs(err - refErr) < 1e-9)
    }
    // codebook members reconstruct exactly: code = own rank, err = 0
    for (j <- 0 until 6) {
      val (codes, err) = out(j.toLong)
      assert(codes.forall(_ == j), s"cb row $j: $codes")
      assert(err == 0.0)
    }
    // dim 8 with nSub = 3 is refused
    val ex = intercept[Exception] {
      Similarity.productQuantize(df, "id", "v", nSub = 3, nCodes = 4)
        .collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("productQuantize"), ex.getMessage)
  }

  test("dbscanCells: cores/borders/noise on a planted two-cluster " +
      "fixture; border attaches to min core-neighbor cluster; cap " +
      "skips a cell loudly into noise; minPts=1 makes singleton cores") {
    import spark.implicits._
    val pts = Seq(
      (10L, Seq(1.0, 0.0)), (11L, Seq(0.99, 0.14)), (12L, Seq(0.99, -0.14)),
      (20L, Seq(0.87, 0.493)), // border: only core neighbor is 11
      (30L, Seq(-1.0, 0.0)), (31L, Seq(-0.99, 0.14)), (32L, Seq(-0.99, -0.14)),
      (40L, Seq(0.0, 1.0))) // noise
      .toDF("vid", "vec")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0)))
      .toDF("cell", "centroid")
    val out = Similarity.dbscanCells(pts, "vid", "vec", cents,
        simMin = 0.9, minPts = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out.size == 8)
    // cluster A: three mutual cores labeled by the min id
    assert(out(10L) == (0L, 3L, true, 10L))
    assert(out(11L) == (0L, 4L, true, 10L)) // 11 also neighbors the border
    assert(out(12L) == (0L, 3L, true, 10L))
    // border 20: one core neighbor (11), not core itself, joins A
    assert(out(20L) == (0L, 2L, false, 10L))
    // cluster C mirrors A in cell 1
    assert(out(30L) == (1L, 3L, true, 30L))
    assert(out(31L) == (1L, 3L, true, 30L))
    assert(out(32L) == (1L, 3L, true, 30L))
    // noise: no neighbors at simMin=0.9, tie-broken into cell 0
    assert(out(40L) == (0L, 1L, false, -1L))
    // cap: cell 0 has 5 members > 4 -> pair stage skipped there, all
    // its members degrade to noise; cell 1 is untouched
    val capped = Similarity.dbscanCells(pts, "vid", "vec", cents,
        simMin = 0.9, minPts = 3, maxCellSize = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    Seq(10L, 11L, 12L, 20L, 40L).foreach(id =>
      assert(capped(id) == (1L, -1L), s"id $id"))
    assert(capped(30L) == (3L, 30L))
    // minPts=1: every point is core; the isolated one is its own cluster
    val solo = Similarity.dbscanCells(pts, "vid", "vec", cents,
        simMin = 0.9, minPts = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(solo(40L) == 40L)
    assert(solo(20L) == 10L) // now core, joins A through its 11 edge
  }
}
