package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageDedup, Multimodal}

/** Perceptual-hash image near-dup: real decode → aHash bands → banded
  * Hamming pairs (q166's operator, off the query fixture). */
class ImageDedupSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", BinaryType)))

  private def frame(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, p) => Row(i, p) }, 2),
      schema)

  test("exact duplicate images pair at hamming 0; corner-swap near-dups at <= 2") {
    val df = frame(Seq(
      1L -> Multimodal.syntheticGrayPng(7, 16, 16, swapCorner = false),
      2L -> Multimodal.syntheticGrayPng(7, 16, 16, swapCorner = false),
      3L -> Multimodal.syntheticGrayPng(7, 16, 16, swapCorner = true),
      4L -> Multimodal.syntheticGrayPng(8, 16, 16, swapCorner = false)))
    val pairs = ImageDedup.nearDupPairs(df, "id", "payload", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)             // byte-for-byte re-encode round trip
    assert(pairs((1L, 3L)) <= 2)             // sum-preserving swap: band 0 only
    assert(pairs((1L, 3L)) == pairs((2L, 3L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L }) // other seed
  }

  test("corrupt, null, and off-8-grid payloads yield null bands and never pair") {
    val good = Multimodal.syntheticGrayPng(3, 16, 16, swapCorner = false)
    val df = frame(Seq(
      1L -> good, 2L -> good,
      3L -> "not a png at all".getBytes("UTF-8"),
      4L -> null,
      5L -> Multimodal.syntheticPng(3, 15, 12))) // 15 % 8 != 0
    val bands = ImageDedup.imageAHashBands(df, "payload")
      .select("id", "band0").collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!bands(1L) && bands(3L) && bands(4L) && bands(5L))
    val pairs = ImageDedup.nearDupPairs(df, "id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("aHash is resize-stable enough to catch a 2x upscale as near-dup") {
    // the production pipeline resizes before hashing; block-mean aHash of
    // a nearest-exact bilinear 2x upscale stays within a small distance
    val base = frame(Seq(1L -> Multimodal.syntheticGrayPng(11, 16, 16, swapCorner = false)))
    val up = Multimodal.resizeImages(base, "payload", 32, 32)
      .select(org.apache.spark.sql.functions.lit(2L).as("id"),
        org.apache.spark.sql.functions.col("resized").as("payload"))
    val both = base.unionByName(up)
    val d = ImageDedup.nearDupPairs(both, "id", "payload", maxHamming = 16)
      .collect()
    assert(d.length == 1 && d.head.getInt(2) <= 16)
  }

  test("degenerate bucket cap keeps candidate generation linear") {
    // 60 identical thumbnails: uncapped would candidate C(60,2)=1770 pairs
    val img = Multimodal.syntheticGrayPng(5, 8, 8, swapCorner = false)
    val df = frame((1L to 60L).map(_ -> img))
    val capped = ImageDedup.nearDupPairs(df, "id", "payload",
      maxHamming = 10, maxBucketSize = 10)
    // cap truncates each bucket to 10 members -> at most C(10,2) pairs
    assert(capped.count() <= 45)
    val uncapped = ImageDedup.nearDupPairs(df, "id", "payload",
      maxHamming = 10, maxBucketSize = 0)
    assert(uncapped.count() == 1770)
  }
}
