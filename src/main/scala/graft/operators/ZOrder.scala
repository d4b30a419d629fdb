package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout move
  * a 100 TB table needs when queries filter on TWO correlated dimensions
  * at once: sorting by (a, b) gives perfect pruning on `a` and none on
  * `b`, while sorting by the bit-interleaved z-value gives every file a
  * small BOUNDING BOX in (a, b) space, so min/max file statistics prune
  * on either dimension (the `OPTIMIZE ZORDER` idea, kept engine-native:
  * the z-value is just a sort key — `df.repartitionByRange(col("z"))`
  * + write produces the clustered layout with plain Spark machinery).
  *
  * Everything here is integer arithmetic in a fixed expression shape —
  * quantization is integer scaling, the bit spread is the classic
  * shift-and-mask ladder, and bucketing is a right shift — so a SQL
  * engine replays the layout bit-for-bit (q212's oracle) and the same
  * code computes identical layouts on any cluster size.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` (long, 0..65535) into the even bit
    * positions of a 32-bit value: ...b2 b1 b0 -> ...0 b2 0 b1 0 b0. */
  def spread16(x: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(m1)
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(m2)
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(m3)
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(m4)
  }

  /** Interleaved 32-bit z-value of two 16-bit quantized coordinates:
    * a's bits land in even positions, b's in odd. */
  def zValue(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Integer division (SQL `div`) for arbitrary Columns — Column./ is
    * IEEE double division, which loses exactness (and replay) once the
    * product tops 2^53. */
  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftShim.expression(a),
        org.apache.spark.sql.GraftShim.expression(b)))

  /** Quantize `c` into 0..65535 against [lo, hi] (inclusive):
    * (c - lo) * 65535 div (hi - lo). LONG multiply + integer div —
    * exact and replayable while (hi - lo) < Long.Max/65535 ≈ 1.4e14
    * (every id/epoch-ms domain in practice); the scale-UP matters so a
    * small domain still fills the top z bits and range-bucketing keeps
    * its two-dimensional locality. Constant columns (hi == lo) map
    * to 0. */
  def quantize16(c: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L)).otherwise(intDiv(
      (c.cast("long") - lo.cast("long")) * lit(65535L),
      hi.cast("long") - lo.cast("long")))

  /** Layout audit: z-order `df` on two integral columns and report, per
    * z-range bucket (top `log2Buckets` bits of the 32-bit z-value), the
    * row count and the (a, b) bounding box. Small boxes = good locality
    * = min/max file statistics would prune on EITHER dimension; the
    * same z + repartitionByRange(z) IS the write path at scale. The
    * domain (min/max of both columns) is computed in one 1-row
    * aggregate and broadcast — the data shuffles once, on z-range. */
  def layoutAudit(df: DataFrame, aCol: String, bCol: String,
      log2Buckets: Int): DataFrame = {
    require(log2Buckets >= 1 && log2Buckets <= 16, s"log2Buckets=$log2Buckets")
    val dom = df.agg(
      min(col(aCol).cast("long")).as("a_lo"), max(col(aCol).cast("long")).as("a_hi"),
      min(col(bCol).cast("long")).as("b_lo"), max(col(bCol).cast("long")).as("b_hi"))
    df.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .crossJoin(broadcast(dom))
      .select(col("a"), col("b"),
        shiftright(zValue(
          quantize16(col("a"), col("a_lo"), col("a_hi")),
          quantize16(col("b"), col("b_lo"), col("b_hi"))),
          32 - log2Buckets).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("a_min"), max(col("a")).as("a_max"),
        min(col("b")).as("b_min"), max(col("b")).as("b_max"))
  }

  /** [[layoutAudit]] on the HILBERT index ([[graft.functions.Hilbert]])
    * instead of the Morton interleave — the locality upgrade: the Z
    * curve jumps a long diagonal every time a high bit flips, so
    * adjacent z buckets can span half the domain on one axis; the
    * Hilbert curve moves one cell per step, so equal-index ranges have
    * provably tighter bounding boxes (Moon et al. 2001) and min/max
    * file statistics prune more files for the same bucket count. Same
    * shape: one broadcast domain row, one shuffle on the bucket. */
  def hilbertAudit(df: DataFrame, aCol: String, bCol: String,
      log2Buckets: Int): DataFrame = {
    require(log2Buckets >= 1 && log2Buckets <= 16, s"log2Buckets=$log2Buckets")
    val dom = df.agg(
      min(col(aCol).cast("long")).as("a_lo"), max(col(aCol).cast("long")).as("a_hi"),
      min(col(bCol).cast("long")).as("b_lo"), max(col(bCol).cast("long")).as("b_hi"))
    df.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .crossJoin(broadcast(dom))
      .select(col("a"), col("b"),
        shiftright(graft.functions.Hilbert.hilbertValue(
          quantize16(col("a"), col("a_lo"), col("a_hi")),
          quantize16(col("b"), col("b_lo"), col("b_hi"))),
          32 - log2Buckets).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("a_min"), max(col("a")).as("a_max"),
        min(col("b")).as("b_min"), max(col("b")).as("b_max"))
  }
}
