package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` payloads + typed metadata structs, with decode /
  * feature-extract / resize / frame-sample stages shaped for batch
  * execution (`mapPartitions` over row batches — the JVM analogue of the
  * arrow-batched UDF pattern).
  *
  * IMAGE decode/resize is REAL (`javax.imageio` + `java.awt` ship in the
  * JDK): [[imageStats]] and [[resizeImages]] run actual PNG/JPEG/BMP
  * codecs, null-safe against corrupt blobs, and are oracle-checked via
  * lossless [[syntheticPng]] fixtures (q117). AUDIO decode is REAL
  * (`javax.sound.sampled` PCM WAV, q120). MULTI-FRAME decode is REAL
  * through the JDK's one multi-frame container — animated GIF
  * ([[videoFrameStats]], q145). True video CODECS (H.264 etc.) remain
  * STUBBED (no codec libraries in this container): `decodeStub` derives
  * deterministic pseudo-features from payload bytes via xxhash64 so the
  * plumbing — schema, partitioning, batch shape, null-safety — is real
  * and testable, and a production codec drops in by replacing one
  * function.
  */
object Multimodal {

  /** Media column schema: payload + typed metadata (FIXTURES-style). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureDim = 16

  /** Deterministic stand-in for a real image/audio decoder: features are
    * xxhash64(payload, seed i) folded into [-1, 1). Replace with a codec
    * for production. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = XXH64.hashUnsafeBytes(payload,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, payload.length, i.toLong)
      out(i) = ((java.lang.Math.floorMod(h, 2000000L) / 1000000.0) - 1.0).toFloat
      i += 1
    }
    out
  }

  /** Feature extraction over binary payloads, batched per partition.
    * Output: input columns + `features array<float>` + `n_bytes`. */
  def extractFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("features", ArrayType(FloatType, containsNull = false))
      .add("n_bytes", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // batch shape: decode per-partition in one pass, no per-row setup cost
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats = decodeStub(payload, featureDim)
        val n = if (payload == null) 0L else payload.length.toLong
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq) :+ n)
      }
    }(enc)
  }

  /** REAL image decode — `javax.imageio` ships in the JDK (PNG/JPEG/BMP/
    * GIF), no external libs. Per payload: width, height, per-channel pixel
    * sums (exact integers — no float accumulation-order concerns) for
    * downstream mean/feature columns. Undecodable or null payloads yield
    * null stats with the row KEPT — a 100 TB media crawl always carries
    * corrupt blobs, and dropping them silently would skew joins.
    * Batched per partition like [[extractFeatures]]; decode cost is
    * per-row Java work with zero shuffle — the scan parallelism is the
    * operator parallelism. */
  def imageStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("sum_r", LongType)
      .add("sum_g", LongType)
      .add("sum_b", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val img =
          if (payload == null) null
          else
            // NonFatal, not just IOException: codec plugins throw runtime
            // exceptions (IllegalArgumentException, CMMException, negative
            // array sizes) on malformed-but-recognized payloads
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        else {
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff
              sg += (p >> 8) & 0xff
              sb += p & 0xff
              x += 1
            }
            y += 1
          }
          // Seq[Any]: Scala would otherwise widen the mixed Int/Long
          // elements to Seq[Long], breaking the IntegerType encoder fields
          Row.fromSeq(r.toSeq ++ Seq[Any](img.getWidth, img.getHeight, sr, sg, sb))
        }
      }
    }(enc)
  }

  /** Deterministic PNG payload for fixtures/tests: pixel (x, y) channel c
    * (0=R, 1=G, 2=B) is `(seed*31 + x*7 + y*13 + c*101) mod 256`. PNG is
    * lossless, so [[imageStats]] over these payloads is an exact
    * closed-form function of (seed, w, h) — the property q117's
    * cross-engine oracle replays without decoding anything. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Int =
          java.lang.Math.floorMod(seed * 31 + x * 7 + y * 13 + c * 101, 256).toInt
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic GRAY PNG for perceptual-hash fixtures (q166): pixel
    * (x, y) has r = g = b = `(t*t + t) mod 256` where
    * `t = (seed*7919 + x*104729 + y*130363) mod 9973` — the squaring
    * makes the texture hash-like (a smooth gradient would leave different
    * seeds only a few aHash bits apart; with this formula distinct seeds
    * sit ~32/64 bits apart, far outside any sane threshold). With
    * `swapCorner` the top-left 4×2 strip swaps its two 2-wide column
    * halves — a perturbation that PRESERVES the total pixel sum (so the
    * aHash mean is unchanged) and is confined to aHash blocks (0,0) and
    * (1,0), i.e. bits 0 and 1 of band 0: the resulting near-duplicate
    * differs from its original by Hamming 0 or 2, always colliding on
    * bands 1–3, which makes banded-LSH recall on the fixture EXACT and
    * the q166 oracle a true equality, not an approximation. */
  def syntheticGrayPng(seed: Long, w: Int, h: Int, swapCorner: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx =
          if (swapCorner && y < 2 && x < 4) { if (x < 2) x + 2 else x - 2 }
          else x
        val t = java.lang.Math.floorMod(seed * 7919 + sx * 104729L + y * 130363L, 9973)
        val v = java.lang.Math.floorMod(t * t + t, 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real resize through the same JDK surface (`java.awt.Graphics2D`
    * bilinear): decode, scale to (w, h), re-encode PNG. Corrupt/null
    * payloads pass through as null. The Spark shape matches
    * [[imageStats]]: per-partition batch, no shuffle. */
  def resizeImages(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val schema = df.schema.add("resized", BinaryType)
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
        val out =
          if (img == null) null
          else {
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** REAL audio decode — `javax.sound.sampled` ships a WAV/PCM codec in
    * the JDK. Per payload: channel count, sample rate, frame count
    * (`n_samples` = frames, i.e. total 16-bit values / channels), and
    * the exact integer sum / sum-of-absolute of the 16-bit samples
    * (integer accumulation — no float order concerns). Undecodable or
    * null payloads yield null stats with the row kept, like
    * [[imageStats]]. PCM WAV is lossless, so [[syntheticWav]] fixtures
    * decode to a closed form the q120 oracle replays. */
  def audioStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("channels", IntegerType)
      .add("sample_rate", IntegerType)
      .add("n_samples", LongType)
      .add("sum_amp", LongType)
      .add("sum_abs_amp", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val decoded: Option[(Int, Int, Long, Long, Long)] =
          if (payload == null) None
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              val fmt = ais.getFormat
              val bytes = ais.readAllBytes()
              ais.close()
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
              else {
                var sum = 0L; var sumAbs = 0L
                var i = 0
                while (i + 1 < bytes.length) {
                  val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
                  sum += s; sumAbs += math.abs(s)
                  i += 2
                }
                // frames, not raw 16-bit values: a stereo WAV has 2 values
                // per frame, so divide by the channel count
                Some((fmt.getChannels, fmt.getSampleRate.toInt,
                  bytes.length / 2L / fmt.getChannels, sum, sumAbs))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((ch, sr, n, s, sa)) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](ch, sr, n, s, sa))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Silence segmentation over 16-bit mono PCM WAV payloads — the audio
    * analogue of text boilerplate spans: long-form recordings are cut at
    * silences before feature extraction, and the segment table (not the
    * waveform) is what flows downstream. Decodes each payload, frames it
    * into `frameLen`-sample windows, marks a frame silent when its exact
    * integer sum of absolute amplitudes is <= `maxSumAbs`, and merges
    * consecutive silent frames into maximal segments with the
    * gaps-and-islands move (frame − row_number per doc — the [[Spans]]
    * pattern on audio frames).
    *
    * Scale shape: decode is map-side (`mapPartitions`, one pass per
    * payload, per-frame Long sums — no float order anywhere); the
    * islands window partitions by document (bounded by the longest
    * single recording, never corpus-scale). Output one row per silent
    * segment: (idCol, seg_start, seg_frames) with frame indices
    * 0-based; a trailing partial frame is dropped (its energy is not
    * comparable at a different length). Undecodable / non-mono /
    * non-16-bit payloads yield ONE (idCol, null, null) row — visible,
    * never silently dropped ([[audioStats]] precedent). */
  def silenceSegments(df: DataFrame, idCol: String, payloadCol: String,
      frameLen: Int, maxSumAbs: Long = 0L): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive: $frameLen")
    val schema = StructType(Seq(df.schema(df.schema.fieldIndex(idCol)),
      StructField("__frame_abs", ArrayType(LongType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val decoded = df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val frames: Array[Long] =
          if (payload == null) null
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              val fmt = ais.getFormat
              val bytes = ais.readAllBytes()
              ais.close()
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
                fmt.getChannels != 1) null
              else {
                val n = bytes.length / 2 / frameLen // full frames only
                val out = new Array[Long](n)
                var f = 0
                while (f < n) {
                  var sumAbs = 0L
                  var t = 0
                  while (t < frameLen) {
                    val i = (f * frameLen + t) * 2
                    val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
                    sumAbs += math.abs(s.toLong)
                    t += 1
                  }
                  out(f) = sumAbs
                  f += 1
                }
                out
              }
            } catch { case scala.util.control.NonFatal(_) => null }
        Row(r.get(idIdx), frames)
      }
    }(enc)
    val frames = decoded.where(col("__frame_abs").isNotNull)
      .select(col(idCol),
        posexplode(col("__frame_abs")).as(Seq("frame", "sum_abs")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame"))
    val segs = frames.where(col("sum_abs") <= maxSumAbs)
      .withColumn("__grp", col("frame") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("frame")).cast("long").as("seg_start"),
        count(lit(1)).as("seg_frames"))
      .drop("__grp")
    segs.unionByName(decoded.where(col("__frame_abs").isNull)
      .select(col(idCol), lit(null).cast("long").as("seg_start"),
        lit(null).cast("long").as("seg_frames")))
  }

  /** [[syntheticWav]] with planted block-aligned silences for fixtures:
    * frame b (of `frameLen` samples) is all-zero when (b + seed) mod 5
    * < 2 — runs of exactly two silent frames, phase-shifted per seed —
    * and the [[syntheticWav]] ramp otherwise (consecutive ramp samples
    * are distinct mod 65536, so at most one per frame is zero and every
    * loud frame has sum_abs > 0). Closed form
    * of (seed, nSamples, frameLen), so silence segments are
    * oracle-replayable arithmetic (q224). */
  def syntheticWavGaps(seed: Long, nSamples: Int, frameLen: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val silent = java.lang.Math.floorMod(t / frameLen + seed, 5L) < 2
      val s =
        if (silent) 0.toShort
        else (java.lang.Math.floorMod(seed * 31 + t * 7L, 65536L) - 32768L).toShort
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV for fixtures/tests: sample t is
    * `((seed*31 + t*7) mod 65536) - 32768`. Lossless, so [[audioStats]]
    * over these payloads is a closed form of (seed, nSamples). */
  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val s = (java.lang.Math.floorMod(seed * 31 + t * 7L, 65536L) - 32768L).toShort
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL multi-frame container decode — animated GIF through
    * `javax.imageio`'s sequence reader (the JDK's one true multi-frame
    * format; proper video codecs stay stubbed, no codec libs here). One
    * output row PER FRAME — the frame-sample-then-featurize pipeline
    * shape — with per-frame dimensions and gray-channel pixel sum.
    * Undecodable or null payloads emit ONE row with null stats (row
    * kept, like [[imageStats]]). GIF is palette-indexed, so frames
    * drawn from a small gray set round-trip LOSSLESSLY and
    * [[syntheticGif]] fixtures make the whole decode a closed form the
    * oracle replays as arithmetic. */
  def videoFrameStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("frame_idx", IntegerType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("sum_gray", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val frames: Seq[(Int, Int, Int, Long)] =
          if (payload == null) Nil
          else
            try {
              val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
              reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(payload)))
              val n = reader.getNumImages(true)
              (0 until n).map { i =>
                val img = reader.read(i)
                var s = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    s += img.getRGB(x, y) & 0xff // gray: all channels equal
                    x += 1
                  }
                  y += 1
                }
                (i, img.getWidth, img.getHeight, s)
              }
            } catch { case scala.util.control.NonFatal(_) => Nil }
        if (frames.isEmpty)
          Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null)))
        else frames.map { case (i, w, h, s) =>
          Row.fromSeq(r.toSeq ++ Seq[Any](i, w, h, s))
        }
      }
    }(enc)
  }

  /** Deterministic animated GIF for fixtures: frame f pixel (x, y) is
    * gray level `((seed*31 + f*17 + x*7 + y*13) mod 8) * 32` — 8 gray
    * levels fit the palette exactly, so the round trip is lossless and
    * [[videoFrameStats]] over these payloads is a closed form of
    * (seed, w, h, nFrames). */
  def syntheticGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = (java.lang.Math.floorMod(seed * 31 + f * 17 + x * 7 + y * 13, 8) * 32).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** Resize stub: records the target dims in metadata and re-derives
    * features at the "resized" payload (deterministic truncation of the
    * byte stream stands in for the pixel op). */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("resized_payload",
      expr(s"substring($payloadCol, 1, greatest(int(length($payloadCol) * " +
        s"least($w * $h / 1048576.0, 1.0)), 1))"))
      .withColumn("target_width", lit(w))
      .withColumn("target_height", lit(h))

  /** Frame-sample stub for video payloads: n evenly spaced "frames" as
    * byte slices, exploded one row per frame with a frame index. */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = length(col(payloadCol))
    val frames = sequence(lit(0), lit(n - 1))
    df.withColumn("frame_idx", explode(frames))
      .withColumn("frame_payload",
        expr(s"substring($payloadCol, int(frame_idx * length($payloadCol) / $n) + 1, " +
          s"greatest(int(length($payloadCol) / $n), 1))"))
      .where(len > 0)
  }

  // ---------------------------------------------------------------- MP4

  /** MP4/ISO-BMFF container METADATA probe — the honest middle ground
    * between the stubbed H.264 decode (no codec libs here) and
    * pretending video doesn't exist: the container structure
    * (ISO/IEC 14496-12 box grammar: [size u32 BE][fourcc], nested) is
    * pure byte arithmetic, so brand, movie duration, track count and
    * per-track codec fourccs are REAL reads a manifest pipeline runs
    * at crawl scale before any decode is attempted. Walks:
    * ftyp (major brand) → moov → mvhd (v0 AND v1 layouts: timescale +
    * duration) → each trak → mdia → minf → stbl → stsd (first sample
    * entry's fourcc). duration_ms = duration·1000 div timescale —
    * integer arithmetic, replayable cross-engine.
    *
    * Corrupt payloads — wrong magic, a box size running past the
    * buffer, size < 8 (other than the size==0 to-end and size==1
    * largesize forms), truncated mvhd/stsd — yield ALL-NULL stats with
    * the row KEPT (the [[imageStats]] q117 contract: a 100 TB crawl
    * always carries corrupt blobs and silent drops skew joins).
    * Batched per partition, zero shuffle: scan parallelism is the
    * operator parallelism. Output: input columns + (major_brand,
    * timescale, duration_units, duration_ms, n_tracks, codecs). */
  def mp4Probe(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("major_brand", StringType)
      .add("timescale", IntegerType)
      .add("duration_units", LongType)
      .add("duration_ms", LongType)
      .add("n_tracks", IntegerType)
      .add("codecs", StringType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val st = mp4Walk(payload)
        st match {
          case Some((brand, ts, du, nt, codecs)) =>
            // ts >= 1 is guaranteed by the walk's structural guard; the
            // ms scale-up is only computed where du*1000 cannot overflow
            // (du past ~292 Myr of units is representable metadata but
            // its ms form is not — null duration_ms, row kept)
            val dms: Any =
              if (du <= Long.MaxValue / 1000L) du * 1000L / ts else null
            Row.fromSeq(r.toSeq ++ Seq[Any](brand, ts, du, dms, nt, codecs))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** The box walk itself: None on ANY structural violation. */
  private[multimodal] def mp4Walk(payload: Array[Byte])
      : Option[(String, Int, Long, Int, String)] = {
    if (payload == null || payload.length < 16) return None
    def u32(off: Int): Long =
      ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
        ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String =
      new String(payload, off, 4, "ISO-8859-1")
    /** Walk children of [start, end); returns (type, payloadStart,
      * payloadEnd) per box or None on a malformed size. */
    def children(start: Int, end: Int): Option[List[(String, Int, Int)]] = {
      var off = start
      val out = List.newBuilder[(String, Int, Int)]
      while (off < end) {
        if (off + 8 > end) return None
        var size = u32(off)
        var hdr = 8
        if (size == 0L) size = (end - off).toLong // box runs to the end
        else if (size == 1L) { // 64-bit largesize form
          if (off + 16 > end) return None
          size = u64(off + 8); hdr = 16
        }
        if (size < hdr || off + size > end) return None
        out += ((fourcc(off + 4), off + hdr, off + size.toInt))
        off += size.toInt
      }
      Some(out.result())
    }
    def child(bs: List[(String, Int, Int)], t: String): Option[(Int, Int)] =
      bs.collectFirst { case (`t`, s, e) => (s, e) }
    for {
      top <- children(0, payload.length)
      _ <- top.headOption.filter(_._1 == "ftyp")
      (fs, fe) <- child(top, "ftyp") if fe - fs >= 8
      brand = fourcc(fs)
      (ms, me) <- child(top, "moov")
      moov <- children(ms, me)
      (hs, he) <- child(moov, "mvhd")
      verOk = he - hs >= 1
      tsdu <- {
        if (!verOk) None
        else payload(hs) & 0xff match {
          // v0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)
          case 0 if he - hs >= 20 => Some((u32(hs + 12), u32(hs + 16)))
          // v1: ver/flags(4) ctime(8) mtime(8) ts(4) dur(8)
          case 1 if he - hs >= 32 => Some((u32(hs + 20), u64(hs + 24)))
          case _ => None
        }
      }
      traks = moov.collect { case ("trak", s, e) => (s, e) }
      codecs <- {
        val cs = traks.map { case (s, e) =>
          for {
            tb <- children(s, e)
            (ms2, me2) <- child(tb, "mdia")
            mb <- children(ms2, me2)
            (is, ie) <- child(mb, "minf")
            ib <- children(is, ie)
            (ss, se) <- child(ib, "stbl")
            sb <- children(ss, se)
            (ds, de) <- child(sb, "stsd")
            // stsd payload: ver/flags(4) entry_count(4), first entry:
            // size(4) format(4)
            _ <- if (de - ds >= 16 && u32(ds + 4) >= 1L) Some(()) else None
          } yield fourcc(ds + 12)
        }
        if (cs.exists(_.isEmpty)) None else Some(cs.flatten.mkString(","))
      }
      // timescale is a u32 "number of units per second" — zero (division
      // by zero downstream) or > Int.MaxValue (wraps negative through
      // .toInt) are structural violations, not representable metadata;
      // a negative u64 duration (sign bit set) is likewise malformed
      _ <- if (tsdu._1 >= 1L && tsdu._1 <= Int.MaxValue.toLong &&
        tsdu._2 >= 0L) Some(()) else None
    } yield (brand, tsdu._1.toInt, tsdu._2, traks.size, codecs)
  }

  /** Deterministic minimal MP4 fixture: box-grammar-correct ftyp + moov
    * with mvhd (version seed%4==0 ? 1 : 0 — both header layouts
    * exercised) and 1 + seed%3 trak chains each down to an stsd sample
    * entry. All probe-visible fields are closed-form in the seed
    * (brand/timescale/duration/codecs below), so the oracle replays
    * [[mp4Probe]] as pure arithmetic — the [[syntheticPng]] contract
    * for containers. Not a playable movie (no mdat, no tkhd): the
    * fixture pins the box WALK, which is the operator under test. */
  def syntheticMp4(seed: Long): Array[Byte] = {
    def box(t: String, body: Array[Byte]): Array[Byte] = {
      val size = body.length + 8
      val out = new Array[Byte](size)
      out(0) = ((size >> 24) & 0xff).toByte
      out(1) = ((size >> 16) & 0xff).toByte
      out(2) = ((size >> 8) & 0xff).toByte
      out(3) = (size & 0xff).toByte
      System.arraycopy(t.getBytes("ISO-8859-1"), 0, out, 4, 4)
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val brand = (seed % 3) match {
      case 0 => "isom"; case 1 => "mp42"; case _ => "dash"
    }
    val timescale = 600L * (1L + seed % 3)
    val duration = 1000L + (seed * 37L) % 100000L
    val nTracks = (1L + seed % 3).toInt
    val ftyp = box("ftyp",
      brand.getBytes("ISO-8859-1") ++ be32(512L) ++
        "isom".getBytes("ISO-8859-1"))
    val mvhd =
      if (seed % 4 == 0) // version 1: 64-bit times
        box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++
          be32(timescale) ++ be64(duration))
      else
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0L) ++ be32(0L) ++
          be32(timescale) ++ be32(duration))
    val traks = (0 until nTracks).map { i =>
      val cc =
        if (i == 0) (seed % 3) match {
          case 0 => "avc1"; case 1 => "hev1"; case _ => "vp09"
        }
        else if ((seed + i) % 2 == 0) "mp4a" else "opus"
      val entry = box(cc, new Array[Byte](8)) // 8 reserved bytes
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1L) ++ entry)
      box("trak", box("mdia", box("minf", box("stbl", stsd))))
    }
    val moov = box("moov", (Seq(mvhd) ++ traks).reduce(_ ++ _))
    ftyp ++ moov
  }

  // --------------------------------------------------------------- EXIF

  /** JPEG/EXIF metadata probe — [[mp4Probe]]'s still-image sibling:
    * walk the JPEG marker stream to APP1, then the TIFF structure
    * inside it (BOTH byte orders — "II" little and "MM" big — are
    * real files), and read IFD0's camera make (ASCII tag 0x010F),
    * orientation (0x0112), pixel width/height (0x0100/0x0101). This
    * is what a crawl manifest wants BEFORE any decode: orientation
    * decides rotation, make/dimensions drive dedup and routing, and
    * none of it needs the entropy-coded scan data.
    *
    * Corrupt payloads — wrong SOI, a marker length past the buffer,
    * no APP1/Exif, bad TIFF magic, an entry offset out of bounds —
    * yield ALL-NULL stats with the row KEPT (the [[imageStats]]
    * contract). Missing individual tags are null FIELDS with the rest
    * populated (tag presence is optional in real EXIF). Batched per
    * partition, zero shuffle. Output: input columns + (byte_order,
    * make, orientation, exif_width, exif_height). */
  def exifProbe(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("byte_order", StringType)
      .add("make", StringType)
      .add("orientation", IntegerType)
      .add("exif_width", LongType)
      .add("exif_height", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        exifWalk(payload) match {
          case Some((bo, make, ori, w, h)) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](bo, make.orNull,
              ori.map(Int.box).orNull, w.map(Long.box).orNull,
              h.map(Long.box).orNull))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** The marker + TIFF walk: None on ANY structural violation;
    * individual missing tags are None fields. */
  private[multimodal] def exifWalk(p: Array[Byte])
      : Option[(String, Option[String], Option[Int], Option[Long], Option[Long])] = {
    if (p == null || p.length < 4) return None
    def u8(i: Int): Int = p(i) & 0xff
    if (u8(0) != 0xff || u8(1) != 0xd8) return None // SOI
    // find APP1 with the Exif header
    var off = 2
    var tiff = -1
    while (tiff < 0) {
      if (off + 4 > p.length) return None
      if (u8(off) != 0xff) return None
      val marker = u8(off + 1)
      if (marker == 0xd9 || marker == 0xda) return None // hit EOI/SOS first
      val len = (u8(off + 2) << 8) | u8(off + 3) // big-endian, incl. itself
      if (len < 2 || off + 2 + len > p.length) return None
      if (marker == 0xe1 && len >= 8 &&
          new String(p, off + 4, 6, "ISO-8859-1") == "Exif  ")
        tiff = off + 10
      else off += 2 + len
    }
    if (tiff + 8 > p.length) return None
    val boStr = new String(p, tiff, 2, "ISO-8859-1")
    val little = boStr match {
      case "II" => true
      case "MM" => false
      case _ => return None
    }
    def u16(i: Int): Int =
      if (i + 2 > p.length) -1
      else if (little) u8(i) | (u8(i + 1) << 8)
      else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i + 4 > p.length) -1L
      else if (little) u8(i) | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3)
    if (u16(tiff + 2) != 42) return None
    val ifd0 = u32(tiff + 4)
    if (ifd0 < 0 || tiff + ifd0 + 2 > p.length) return None
    val base = tiff + ifd0.toInt
    val n = u16(base)
    if (n < 0 || base + 2 + n * 12 > p.length) return None
    var make: Option[String] = None
    var ori: Option[Int] = None
    var w: Option[Long] = None
    var h: Option[Long] = None
    var i = 0
    while (i < n) {
      val e = base + 2 + i * 12
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      tag match {
        case 0x010f if typ == 2 && cnt >= 1 => // Make, ASCII at offset
          val vo = tiff + u32(e + 8)
          if (cnt > 4 && vo >= 0 && vo + cnt <= p.length) {
            val raw = new String(p, vo.toInt, cnt.toInt, "ISO-8859-1")
            make = Some(raw.takeWhile(_ != ' '))
          }
        case 0x0112 if typ == 3 && cnt == 1 =>
          ori = Some(u16(e + 8)) // SHORT rides the value field's head
        case 0x0100 if (typ == 3 || typ == 4) && cnt == 1 =>
          w = Some(if (typ == 3) u16(e + 8).toLong else u32(e + 8))
        case 0x0101 if (typ == 3 || typ == 4) && cnt == 1 =>
          h = Some(if (typ == 3) u16(e + 8).toLong else u32(e + 8))
        case _ => ()
      }
      i += 1
    }
    Some((boStr, make, ori, w, h))
  }

  /** Deterministic minimal JPEG-with-EXIF fixture: SOI + APP1(Exif →
    * TIFF, byte order II when seed is even / MM when odd — both real
    * layouts exercised) + EOI. IFD0 carries Make (ASCII, data area),
    * Orientation (SHORT), ImageWidth/ImageLength (LONG), all
    * closed-form in the seed, so the oracle replays [[exifProbe]] as
    * arithmetic (the [[syntheticMp4]] contract). Not a decodable
    * image (no scan data): the fixture pins the WALK. */
  def syntheticJpegExif(seed: Long): Array[Byte] = {
    val little = seed % 2 == 0
    def w16(v: Int): Array[Byte] =
      if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def w32(v: Long): Array[Byte] =
      if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val make = s"CAM${seed % 7} ".getBytes("ISO-8859-1")
    val nEntries = 4
    // TIFF layout: header(8) + count(2) + 4*12 entries + next(4) + data
    val dataOff = 8 + 2 + nEntries * 12 + 4
    def entry(tag: Int, typ: Int, cnt: Long, value: Array[Byte]): Array[Byte] =
      w16(tag) ++ w16(typ) ++ w32(cnt) ++ value.padTo(4, 0.toByte)
    val entries =
      entry(0x0100, 4, 1L, w32(640L + (seed * 13) % 1024)) ++
      entry(0x0101, 4, 1L, w32(480L + (seed * 17) % 768)) ++
      entry(0x010f, 2, make.length.toLong, w32(dataOff.toLong)) ++
      entry(0x0112, 3, 1L, w16((1L + seed % 8).toInt) ++ Array[Byte](0, 0))
    val tiffHdr = (if (little) "II" else "MM").getBytes("ISO-8859-1") ++
      w16(42) ++ w32(8L)
    val tiffBody = tiffHdr ++ w16(nEntries) ++ entries ++ w32(0L) ++ make
    val exif = "Exif  ".getBytes("ISO-8859-1") ++ tiffBody
    val app1Len = exif.length + 2 // includes the length field itself
    Array(0xff.toByte, 0xd8.toByte, // SOI
      0xff.toByte, 0xe1.toByte,     // APP1 (length is ALWAYS big-endian)
      ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte) ++
      exif ++ Array(0xff.toByte, 0xd9.toByte) // EOI
  }

  /** Typed metadata projection for mixed-media tables: route rows by mime
    * family; downstream stages filter on `media_kind` so each modality's
    * decode runs over a pruned scan. */
  def withMediaKind(df: DataFrame, mimeCol: String): DataFrame =
    df.withColumn("media_kind",
      when(col(mimeCol).startsWith("image/"), "image")
        .when(col(mimeCol).startsWith("audio/"), "audio")
        .when(col(mimeCol).startsWith("video/"), "video")
        .otherwise("other"))

  // ---------------------------------------------------------------- WARC

  /** WARC (ISO 28500) record walk — the CRAWL-NATIVE container probe:
    * web-scale corpora arrive as concatenated WARC records (version
    * line, CRLF header block, Content-Length-delimited payload,
    * CRLF CRLF separator), and the FIRST pipeline stage over 100 TB of
    * crawl is exactly this split — record boundaries, types, target
    * URIs and payload stats — before any text extraction runs. Pure
    * byte arithmetic (the [[mp4Probe]] contract: no codec libs, real
    * structure), batched per partition, zero shuffle; EXPLODES one
    * output row per record.
    *
    * Structural violations — bad magic, a header block without CRLFCRLF
    * termination, a missing/unparsable Content-Length, a payload
    * running past the buffer — yield ONE all-null row with the input
    * KEPT (a crawl always carries truncated blobs; silent drops skew
    * joins). Records after the violation are unreachable by definition
    * (lengths chain), so the walk refuses the WHOLE payload rather
    * than emit a suffix it cannot trust. Output: input columns +
    * (rec_idx, warc_type, target_uri, content_length, block_sum —
    * the payload bytes' unsigned sum, the cheap integrity census). */
  def warcProbe(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("rec_idx", IntegerType)
      .add("warc_type", StringType)
      .add("target_uri", StringType)
      .add("content_length", LongType)
      .add("block_sum", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        warcWalk(payload) match {
          case Some(recs) => recs.zipWithIndex.map { case (rec, i) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](i, rec._1, rec._2, rec._3,
              rec._4))
          }
          case None =>
            Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null)))
        }
      }
    }(enc)
  }

  /** The walk itself: None on ANY structural violation. Per record:
    * (warc_type, target_uri, content_length, block_sum) — type/uri
    * null when the header omits them (legal WARC), length mandatory. */
  private[multimodal] def warcWalk(payload: Array[Byte])
      : Option[List[(String, String, Long, Long)]] = {
    if (payload == null || payload.length < 10) return None
    val out = List.newBuilder[(String, String, Long, Long)]
    var off = 0
    while (off < payload.length) {
      // version line must open every record
      val magic = "WARC/1.0\r\n".getBytes("ISO-8859-1")
      if (off + magic.length > payload.length) return None
      var k = 0
      while (k < magic.length) {
        if (payload(off + k) != magic(k)) return None
        k += 1
      }
      // header block ends at the first CRLFCRLF
      var he = off + magic.length
      var found = false
      while (!found && he + 3 < payload.length) {
        if (payload(he) == '\r' && payload(he + 1) == '\n' &&
          payload(he + 2) == '\r' && payload(he + 3) == '\n') found = true
        else he += 1
      }
      if (!found) return None
      val header = new String(payload, off + magic.length,
        he - off - magic.length, "ISO-8859-1")
      var cl = -1L
      var wtype: String = null
      var uri: String = null
      header.split("\r\n").foreach { line =>
        val c = line.indexOf(':')
        if (c > 0) {
          val name = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          name match {
            case "content-length" =>
              cl = try value.toLong catch { case _: Throwable => -1L }
            case "warc-type" => wtype = value
            case "warc-target-uri" => uri = value
            case _ => ()
          }
        }
      }
      if (cl < 0L) return None
      val bs = he + 4
      if (bs + cl + 2 + 2 > payload.length.toLong) return None
      var sum = 0L
      var p = 0
      while (p < cl) { sum += payload(bs + p) & 0xff; p += 1 }
      // the two CRLF record separators are mandatory
      val se = bs + cl.toInt
      if (payload(se) != '\r' || payload(se + 1) != '\n' ||
        payload(se + 2) != '\r' || payload(se + 3) != '\n') return None
      out += ((wtype, uri, cl, sum))
      off = se + 4
    }
    val recs = out.result()
    if (recs.isEmpty) None else Some(recs)
  }

  /** Deterministic WARC fixture: 1 + seed%4 records; record i carries
    * type (seed+i)%3 -> response/request/metadata, target URI
    * "http://ex.test/{seed}/{i}", and a payload of
    * 10 + (seed*7 + i*13)%50 bytes whose byte p is
    * (seed*31 + i*17 + p*7) mod 256 — every probe-visible field (and
    * block_sum) a closed form of (seed, i), the [[syntheticMp4]]
    * oracle-replayability contract. */
  def syntheticWarc(seed: Long): Array[Byte] = {
    val n = (1L + java.lang.Math.floorMod(seed, 4L)).toInt
    val bos = new java.io.ByteArrayOutputStream()
    for (i <- 0 until n) {
      val typ = java.lang.Math.floorMod(seed + i, 3L) match {
        case 0L => "response"; case 1L => "request"; case _ => "metadata"
      }
      val len = 10L + java.lang.Math.floorMod(seed * 7L + i * 13L, 50L)
      val hdr = s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
        s"WARC-Target-URI: http://ex.test/$seed/$i\r\n" +
        s"Content-Length: $len\r\n\r\n"
      bos.write(hdr.getBytes("ISO-8859-1"))
      var p = 0L
      while (p < len) {
        bos.write(java.lang.Math.floorMod(
          seed * 31L + i * 17L + p * 7L, 256L).toInt)
        p += 1L
      }
      bos.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    bos.toByteArray
  }
}
