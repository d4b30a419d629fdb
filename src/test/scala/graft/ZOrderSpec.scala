package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout operator (q212), off-fixture: closed-form interleave
  * values and the locality guarantee on a uniform grid. */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  private def one(c: org.apache.spark.sql.Column): Long = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.cast("long")).head().getLong(0)
  }

  test("spread16 and zValue match closed-form Morton codes") {
    assert(one(ZOrder.spread16(lit(0L))) == 0L)
    assert(one(ZOrder.spread16(lit(1L))) == 1L)
    assert(one(ZOrder.spread16(lit(2L))) == 4L)
    assert(one(ZOrder.spread16(lit(0xFFFFL))) == 0x55555555L)
    // a fills even bits, b odd bits
    assert(one(ZOrder.zValue(lit(0xFFFFL), lit(0L))) == 0x55555555L)
    assert(one(ZOrder.zValue(lit(0L), lit(0xFFFFL))) == 0xAAAAAAAAL)
    assert(one(ZOrder.zValue(lit(0xFFFFL), lit(0xFFFFL))) == 0xFFFFFFFFL)
    // (a=3, b=1): bits a0a1 at 0,2; b0 at 1 -> 1 + 2 + 4 = 7
    assert(one(ZOrder.zValue(lit(3L), lit(1L))) == 7L)
  }

  test("quantize16 scales any domain onto 0..65535 inclusive") {
    assert(one(ZOrder.quantize16(lit(0L), lit(0L), lit(127L))) == 0L)
    assert(one(ZOrder.quantize16(lit(127L), lit(0L), lit(127L))) == 65535L)
    assert(one(ZOrder.quantize16(lit(5L), lit(5L), lit(5L))) == 0L) // constant col
    // huge domain: no overflow, endpoints exact
    val hi = 140737488355327L // 2^47 - 1, inside the documented bound
    assert(one(ZOrder.quantize16(lit(hi), lit(0L), lit(hi))) == 65535L)
  }

  test("uniform grid: every bucket's bounding box spans <= 1/8 of each dimension") {
    import spark.implicits._
    val grid = (for { a <- 0 until 128; b <- 0 until 128 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val audit = ZOrder.layoutAudit(grid, "a", "b", log2Buckets = 6).collect()
    assert(audit.length == 64)
    assert(audit.map(_.getAs[Long]("n_rows")).sum == 128L * 128L)
    audit.foreach { r =>
      // 64 buckets = 3 top bits per dimension -> each box covers ~1/8th
      // (16 cells) of either axis; +1 slack for the quantization floor
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") <= 17,
        s"bucket ${r.getAs[Long]("bucket")} a-span too wide: $r")
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") <= 17,
        s"bucket ${r.getAs[Long]("bucket")} b-span too wide: $r")
    }
  }
}
