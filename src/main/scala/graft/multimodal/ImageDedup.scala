package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-duplicate detection — the LAION-style
  * media dedup the reference has no analogue for (its pipeline is
  * text/market data only; this extends the training-data surface the
  * same way [[Multimodal]] does for decode).
  *
  * Shape: REAL decode (`javax.imageio`) → 8×8 block-mean average-hash
  * (aHash) → the 64-bit fingerprint split into 4 × 16-bit BANDS →
  * bucket self-join on any colliding band → exact Hamming verification
  * on the candidates. Identical scale structure to
  * [[graft.operators.Dedup.simhashNearDups]]: only (id, band, h) rows
  * shuffle for candidate generation, the pairwise Hamming check runs on
  * bucket collisions only (never all-pairs), and degenerate buckets —
  * a million identical thumbnails — are capped with the shared
  * [[graft.operators.Dedup.capBuckets]] guard. Recall: any pair within
  * Hamming distance < 4 shares at least one intact band (pigeonhole);
  * beyond that recall degrades gracefully like every banded LSH.
  *
  * All hash arithmetic is INTEGER (block sums, floor means, strict
  * greater-than threshold), so on lossless fixtures the whole decode →
  * hash → pair pipeline is a closed form a SQL oracle replays exactly
  * (q166).
  */
object ImageDedup {

  /** Real decode → 8×8 block-mean aHash as 4 × 16-bit band columns
    * (`band0..band3` int). Input images must have width and height
    * divisible by 8 (production pipelines resize first — see
    * [[Multimodal.resizeImages]]); undecodable, null, or off-grid
    * payloads yield null bands with the row KEPT, matching the
    * [[Multimodal.imageStats]] null-safety contract.
    *
    * aHash: gray(x,y) = floor((r+g+b)/3); block (bx,by) value g =
    * floor(sum of its gray pixels / block area); bit (by*8+bx) = 1 iff
    * g*64 > total (strict integer compare — no float mean). Band k
    * packs bits [16k, 16k+16) little-endian.
    */
  def imageAHashBands(df: DataFrame, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
      .add("band0", IntegerType).add("band1", IntegerType)
      .add("band2", IntegerType).add("band3", IntegerType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val img =
          if (payload == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth % 8 != 0 || img.getHeight % 8 != 0 ||
            img.getWidth == 0 || img.getHeight == 0)
          Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else {
          val bw = img.getWidth / 8
          val bh = img.getHeight / 8
          val blocks = new Array[Long](64)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              val gray = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              blocks((y / bh) * 8 + x / bw) += gray
              x += 1
            }
            y += 1
          }
          var total = 0L
          var i = 0
          while (i < 64) { blocks(i) /= (bw.toLong * bh); total += blocks(i); i += 1 }
          val bands = new Array[Int](4)
          i = 0
          while (i < 64) {
            if (blocks(i) * 64 > total) bands(i / 16) |= 1 << (i % 16)
            i += 1
          }
          Row.fromSeq(r.toSeq ++ Seq[Any](bands(0), bands(1), bands(2), bands(3)))
        }
      }
    }(enc)
  }

  private def hamming(prefA: String, prefB: String): Column =
    (0 to 3).map(k =>
      call_function("bit_count",
        col(s"$prefA$k").bitwiseXOR(col(s"$prefB$k")))).reduce(_ + _)

  /** Near-duplicate image pairs: banded aHash candidates, exact Hamming
    * verify. Output: (id_a, id_b, hamming) with hamming <= `maxHamming`,
    * id_a < id_b, one row per pair. Undecodable payloads (null bands)
    * never pair. `maxBucketSize` caps degenerate buckets (0 disables) —
    * an exact-dup image cluster of m thumbnails otherwise candidates
    * O(m²) inside one bucket; production runs exact-payload dedup first
    * and keeps the cap as a guard.
    */
  def nearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 10, maxBucketSize: Int = 2000): DataFrame = {
    val ah = imageAHashBands(
      df.select(col(idCol).as("id"), col(payloadCol).as("payload")), "payload")
      .where(col("band0").isNotNull)
      .select(col("id"), col("band0"), col("band1"), col("band2"), col("band3"))
    // long form: only (id, band, h) shuffles for candidate generation
    val long = ah.select(col("id"), explode(array((0 to 3).map(k =>
        struct(lit(k).as("band"), col(s"band$k").as("h"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.h"))
    val capped = graft.operators.Dedup.capBuckets(long, Seq("band", "h"), maxBucketSize)
    val cands = capped.alias("a").join(capped.alias("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val aSide = ah.toDF("id_a", "a0", "a1", "a2", "a3")
    val bSide = ah.toDF("id_b", "b0", "b1", "b2", "b3")
    cands.join(aSide, "id_a").join(bSide, "id_b")
      .select(col("id_a"), col("id_b"), hamming("a", "b").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
