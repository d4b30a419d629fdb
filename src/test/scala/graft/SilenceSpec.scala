package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Audio silence segmentation (q224's operator, off-fixture). */
class SilenceSpec extends AnyFunSuite with SparkFixture {

  private def segsOf(payload: Array[Byte], frameLen: Int,
      maxSumAbs: Long = 0L): Seq[(Option[Long], Option[Long])] = {
    import spark.implicits._
    val df = Seq((1L, payload)).toDF("id", "payload")
    Multimodal.silenceSegments(df, "id", "payload", frameLen, maxSumAbs)
      .collect().toSeq.map(r => (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
  }

  test("planted gap runs merge into maximal segments") {
    // seed 0, 8 frames of 64: silent frames b with b % 5 < 2 -> {0,1,5,6}
    val wav = Multimodal.syntheticWavGaps(0L, 8 * 64, frameLen = 64)
    assert(segsOf(wav, 64).sortBy(_._1) ===
      Seq((Some(0L), Some(2L)), (Some(5L), Some(2L))))
  }

  test("phase shift moves the segments; truncated run at the boundary") {
    // seed 4, 6 frames: silent b with (b+4) % 5 < 2 -> {1,2, 6(absent)}
    val wav = Multimodal.syntheticWavGaps(4L, 6 * 64, frameLen = 64)
    assert(segsOf(wav, 64) === Seq((Some(1L), Some(2L))))
  }

  test("trailing partial frame is dropped, not scored") {
    // 130 samples at frameLen 64 -> exactly 2 full frames (0 silent for
    // seed 0), the 2-sample tail ignored
    val wav = Multimodal.syntheticWavGaps(0L, 130, frameLen = 64)
    assert(segsOf(wav, 64) === Seq((Some(0L), Some(2L))))
  }

  test("maxSumAbs threshold catches quiet-but-nonzero frames") {
    // pure ramp wav (no planted zeros): every frame is loud at thr=0
    val wav = Multimodal.syntheticWav(7L, 4 * 64)
    assert(segsOf(wav, 64) === Seq.empty)
    // with a threshold at max possible energy every frame is "silent"
    val all = segsOf(wav, 64, maxSumAbs = 64L * 32768L)
    assert(all === Seq((Some(0L), Some(4L))))
  }

  test("undecodable payloads surface as one null row, never vanish") {
    import spark.implicits._
    val good = Multimodal.syntheticWavGaps(0L, 8 * 64, frameLen = 64)
    val df = Seq((1L, good), (2L, "not a wav".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val got = Multimodal.silenceSegments(df, "id", "payload", 64)
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
    assert(got.filter(_._1 == 1L).forall(!_._2))
    assert(got.count(t => t._1 == 2L && t._2) === 1)
    assert(got.count(t => t._1 == 3L && t._2) === 1)
  }
}
