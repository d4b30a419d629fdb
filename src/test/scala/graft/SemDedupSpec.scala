package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SemDedup

/** SemDeDup semantics on closed-form fixtures: axis-aligned vectors make
  * every cosine 0 or 1-ish by construction, so cluster membership and the
  * drop rule are hand-checkable. */
class SemDedupSpec extends AnyFunSuite with SparkFixture {

  private def vec(xs: Double*): Seq[Double] = xs

  // two well-separated directions + a near-copy of each member
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, vec(1.0, 0.0, 0.0, 0.0)),
      (2L, vec(0.0, 1.0, 0.0, 0.0)),
      (3L, vec(0.99, 0.01, 0.0, 0.0)),  // near-copy of 1 -> same cell, cos ~1
      (4L, vec(0.01, 0.99, 0.0, 0.0)),  // near-copy of 2
      (5L, vec(0.0, 0.0, 1.0, 0.0))     // isolated direction
    ).toDF("vec_id", "v")
  }

  test("later near-copies drop; earliest copy and isolated vectors keep") {
    val out = SemDedup.semDedup(fixture, "vec_id", "v", nCells = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && out(2L), "cluster seeds keep")
    assert(!out(3L) && !out(4L), "near-copies of an earlier id drop")
    assert(out(5L), "no same-cell earlier neighbor above threshold")
  }

  test("threshold bounds the drop: orthogonal members of one cell all keep") {
    import spark.implicits._
    // one cell (centroid = id 1); ids 2 and 3 orthogonal to each other
    val df = Seq(
      (1L, vec(1.0, 1.0, 0.0, 0.0)),
      (2L, vec(1.0, 0.0, 0.0, 0.0)),
      (3L, vec(0.0, 1.0, 0.0, 0.0))
    ).toDF("vec_id", "v")
    val out = SemDedup.semDedup(df, "vec_id", "v", nCells = 1, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.values.forall(identity), s"nothing >= 0.95 here: $out")
  }

  test("near-dups in DIFFERENT cells are not compared (the SemDeDup contract)") {
    import spark.implicits._
    // centroids = ids 1, 2; ids 3 and 4 have cos(3,4) = 0.96 but land in
    // different cells (each 0.8 from its centroid, below the 0.85
    // threshold) — cross-cell pairs are by design not generated.
    val df = Seq(
      (1L, vec(1.0, 0.0, 0.0, 0.0)),
      (2L, vec(0.0, 1.0, 0.0, 0.0)),
      (3L, vec(0.8, 0.6, 0.0, 0.0)),    // cell 1
      (4L, vec(0.6, 0.8, 0.0, 0.0))     // cell 2
    ).toDF("vec_id", "v")
    val out = SemDedup.semDedup(df, "vec_id", "v", nCells = 2, threshold = 0.85)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.values.forall(identity), s"cross-cell pair must not drop: $out")
    // contrast: collapse to one cell and the (3, 4) pair IS seen
    val oneCell = SemDedup.semDedup(df, "vec_id", "v", nCells = 1, threshold = 0.85)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!oneCell(4L) && oneCell(3L), s"one cell: 4 drops against 3: $oneCell")
  }

  test("maxCellSize guard: oversized cell skips pair generation, census reports it") {
    import spark.implicits._
    // 30 identical vectors -> one degenerate cell
    val df = (1L to 30L).map(i => (i, vec(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "v")
    val guarded = SemDedup.semDedup(df, "vec_id", "v", nCells = 1,
      threshold = 0.9, maxCellSize = 10)
      .collect()
    assert(guarded.forall(_.getBoolean(2)), "over-cap cell generates no drops")
    val unguarded = SemDedup.semDedup(df, "vec_id", "v", nCells = 1, threshold = 0.9)
      .where(!col("kept")).count()
    assert(unguarded == 29, "without the cap, all but the first drop")
    val census = SemDedup.oversizedCells(
      SemDedup.assignCells(df, "vec_id", "v",
        SemDedup.smallestIdCentroids(df, "vec_id", "v", 1)), 10).collect()
    assert(census.length == 1 && census(0).getAs[Long]("n_members") == 30L)
  }

  test("random corpus: operator equals a plain-Scala brute-force simulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = IndexedSeq.fill(80)(Array.fill(8)(rnd.nextGaussian()))
    // plant near-copies at every 9th position to make drops likely
    val vecs = (0 until 80).map { i =>
      val v = if (i % 9 == 0 && i > 0) base(i / 9 - 1).map(_ * 1.02 + 0.01) else base(i)
      (i.toLong, v.toSeq)
    }
    val data = vecs.toDF("vec_id", "v")
    val (nCells, t) = (4, 0.85)
    // plain-Scala replay of the published algorithm
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var sa = 0.0; var sb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); sa += a(i) * a(i); sb += b(i) * b(i) }
      dot / (math.sqrt(sa) * math.sqrt(sb))
    }
    val arr = vecs.map { case (i, v) => (i, v.toArray) }
    val cents = arr.sortBy(_._1).take(nCells)
    val cell = arr.map { case (i, v) =>
      i -> cents.map { case (c, cv) => (cos(v, cv), -c) }.max._2 * -1
    }.toMap
    val expectDropped = (for {
      (i, vi) <- arr; (j, vj) <- arr
      if i < j && cell(i) == cell(j) && cos(vi, vj) >= t
    } yield j).toSet
    val got = SemDedup.semDedup(data, "vec_id", "v", nCells, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.filterNot(_._3).map(_._1).toSet == expectDropped)
    assert(got.forall { case (i, c, _) => c == cell(i) })
  }

  test("zero-norm vectors get a null cell and are kept, never paired") {
    import spark.implicits._
    val df = Seq(
      (1L, vec(1.0, 0.0, 0.0, 0.0)),
      (2L, vec(0.0, 0.0, 0.0, 0.0)), // NaN against every centroid
      (3L, vec(1.0, 0.0, 0.0, 0.0))  // exact copy of 1 -> drops
    ).toDF("vec_id", "v")
    val rows = SemDedup.semDedup(df, "vec_id", "v", nCells = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getBoolean(2))).toMap
    assert(rows(2L) == ((true, true)), "zero vector: null cell, kept")
    assert(rows(1L) == ((false, true)) && rows(3L) == ((false, false)))
  }

  test("hierarchical assignment equals flat when branch covers all cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val data = IndexedSeq.tabulate(60)(i => (i.toLong,
      Array.fill(6)(rnd.nextGaussian()).toSeq)).toDF("vec_id", "v")
    val cents = SemDedup.smallestIdCentroids(data, "vec_id", "v", 8)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val flat = asMap(SemDedup.assignCells(data, "vec_id", "v", cents))
    val hier = asMap(SemDedup.assignCellsHierarchical(
      data, "vec_id", "v", cents, branch = 8))
    assert(hier === flat)
  }

  test("hierarchical path still drops exact duplicates (co-assignment)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val base = IndexedSeq.tabulate(50)(i => (i.toLong,
      Array.fill(6)(rnd.nextGaussian()).toSeq))
    // exact copies of every 5th vector appended with later ids
    val copies = base.collect { case (i, v) if i % 5 == 0 => (i + 1000L, v) }
    val data = (base ++ copies).toDF("vec_id", "v")
    val cents = SemDedup.smallestIdCentroids(data, "vec_id", "v", 16)
    val out = SemDedup.semDedupHierarchical(data, "vec_id", "v", cents,
        branch = 4, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    copies.foreach { case (id, _) =>
      assert(!out(id), s"exact copy $id must co-assign with its original and drop")
    }
    assert(base.forall { case (id, _) => out(id) }, "originals all keep")
  }

  test("semDedupWith auto-dispatch: flat under the cap, hierarchical above it") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val data = IndexedSeq.tabulate(80)(i => (i.toLong,
      Array.fill(6)(rnd.nextGaussian()).toSeq)).toDF("vec_id", "v")
    val cents = SemDedup.smallestIdCentroids(data, "vec_id", "v", 9)
    def asRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // cap below k: the default call must equal the explicit hierarchical
    // path with branch = round(sqrt(k)) = 3
    val auto = asRows(SemDedup.semDedupWith(data, "vec_id", "v", cents,
      threshold = 0.95, flatCellCap = 4))
    val hier = asRows(SemDedup.semDedupHierarchical(data, "vec_id", "v",
      cents, branch = 4, threshold = 0.95))
    assert(auto === hier)
    // cap at/above k (and the Int.MaxValue pin): exact flat path
    val flat = asRows(SemDedup.semDedupAssigned(
      SemDedup.assignCells(data, "vec_id", "v", cents), threshold = 0.95))
    assert(asRows(SemDedup.semDedupWith(data, "vec_id", "v", cents,
      threshold = 0.95)) === flat)
    assert(asRows(SemDedup.semDedupWith(data, "vec_id", "v", cents,
      threshold = 0.95, flatCellCap = Int.MaxValue)) === flat)
  }

  test("hierarchical cells are real centroid ids and every row lands somewhere") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val data = IndexedSeq.tabulate(90)(i => (i.toLong,
      Array.fill(6)(rnd.nextGaussian()).toSeq)).toDF("vec_id", "v")
    val cents = SemDedup.smallestIdCentroids(data, "vec_id", "v", 12)
    val centIds = cents.collect().map(_.getLong(0)).toSet
    val hier = SemDedup.assignCellsHierarchical(
      data, "vec_id", "v", cents, branch = 3).collect()
    assert(hier.length === 90)
    hier.foreach(r => assert(centIds.contains(r.getLong(2))))
  }

  test("assignCellsTree: fanout >= k degenerates to the EXACT flat " +
      "argmax; deep ladders land on real centroid ids; exact dups " +
      "co-assign at depth") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val base = IndexedSeq.tabulate(120)(i => (i.toLong,
      Array.fill(6)(rnd.nextGaussian()).toSeq))
    // plant exact duplicates of every 10th vector at shifted ids
    val data = (base ++ base.filter(_._1 % 10 == 0)
      .map { case (i, v) => (i + 1000L, v) }).toDF("vec_id", "v")
    val cents = SemDedup.smallestIdCentroids(data, "vec_id", "v", 24)
    val centIds = cents.collect().map(_.getLong(0)).toSet
    // identity: one level (fanout >= k) IS assignCells
    val flat = SemDedup.assignCells(data, "vec_id", "v", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val one = SemDedup.assignCellsTree(data, "vec_id", "v", cents,
      fanout = 24).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one === flat)
    // deep ladder (24 -> 8 -> 3): real cells, full coverage, dup co-assign
    val deep = SemDedup.assignCellsTree(data, "vec_id", "v", cents,
      fanout = 3).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(deep.size === data.count())
    deep.values.foreach(c => assert(centIds.contains(c)))
    base.filter(_._1 % 10 == 0).foreach { case (i, _) =>
      assert(deep(i) === deep(i + 1000L), s"dup pair $i split cells")
    }
    // the dedup wrapper drops the planted dups whatever the boundaries
    val out = SemDedup.semDedupTree(data, "vec_id", "v", cents,
      fanout = 3, threshold = 0.999999)
      .where(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(base.filter(_._1 % 10 == 0).map(_._1 + 1000L).toSet
      .subsetOf(out))
  }

  test("recommendedCells: 1000-member target cells, clamped both ends") {
    // k ∝ n keeps the n²/k pair stage linear; the floor keeps tiny
    // corpora from degenerating to one cell, the 2^20 ceiling bounds
    // the centroid broadcast
    assert(SemDedup.recommendedCells(0L) === 16)
    assert(SemDedup.recommendedCells(15999L) === 16)
    assert(SemDedup.recommendedCells(1000000L) === 1000)
    assert(SemDedup.recommendedCells(100L * 1000 * 1000 * 1000) === (1 << 20))
  }
}
