package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hashing kernels for the dedup operators.
  *
  * The declarative formulations in [[graft.operators.Dedup]] (higher-order
  * `aggregate`/`transform` folds) are exact but interpreted — Catalyst
  * higher-order functions are CodegenFallback, so a k=32 minhash over a
  * 5k-doc corpus spent ~30s in per-element interpretation at sf0.1. These
  * expressions compute the identical values (same xxhash64 family, same
  * tokenization) in one tight JVM loop per document and participate in
  * whole-stage codegen via a static call.
  *
  * Hash-compatibility contract (kept test-verified against the declarative
  * versions):
  *  - shingle base hash  = XXH64.hashUTF8String(shingle, seed=42)
  *    == SQL xxhash64(shingle)
  *  - family member i    = XXH64.hashInt(i, base)
  *    == SQL xxhash64(shingle, i) for int literal i
  *  - simhash token hash = XXH64.hashUTF8String(token, 42) == xxhash64(token)
  */
object FastHash {

  private val Seed = 42L

  /** Tokens of lower(trim(text)) split on \s+ (matches Dedup.shingles). */
  private def tokens(text: UTF8String): Array[String] =
    text.trim().toLowerCase().toString.split("\\s+")

  /** k-wide MinHash signature over distinct word n-gram shingles; null when
    * the text has fewer than n tokens (no shingles). */
  def minhashSig(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val sh = sb.toString
      if (seen.add(sh)) {
        val base = XXH64.hashUTF8String(UTF8String.fromString(sh), Seed)
        var m = 0
        while (m < k) {
          val h = XXH64.hashInt(m, base)
          if (h < mins(m)) mins(m) = h
          m += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over word tokens (bit j set iff the count of tokens
    * with bit j in xxhash64(token) exceeds those without). */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), Seed)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Sign-random-projection bucket over an array<double> vector —
    * bit-identical to the declarative [[graft.operators.Similarity]]
    * formulation: plane component (t, p, i) =
    * pmod(xxhash64(t, p, i, 42), 2e6)/1e6 - 1, bit p set iff dot >= 0. */
  def srpBucketValue(vec: ArrayData, table: Int, planes: Int): Long = {
    val n = vec.numElements()
    var fp = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      // xxhash64(lit(table), lit(plane), i, lit(42)) fold, seed 42
      val hTable = XXH64.hashInt(table, Seed)
      val hPlane = XXH64.hashInt(p, hTable)
      while (i < n) {
        val h = XXH64.hashInt(Seed.toInt, XXH64.hashInt(i, hPlane))
        val m = ((h % 2000000L) + 2000000L) % 2000000L
        dot += vec.getDouble(i) * (m / 1000000.0 - 1.0)
        i += 1
      }
      if (dot >= 0) fp |= (1L << p)
      p += 1
    }
    fp
  }

  /** Distinct word n-gram shingles in first-occurrence order — the
    * one-pass form of Dedup.shingles (set-equal, cross-check-tested). */
  def shinglesValue(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val arr = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = it.next(); m += 1 }
    new GenericArrayData(arr)
  }

  /** Cosine similarity over two array<double> vectors in one tight loop —
    * value-identical to the declarative zip_with/aggregate formulation in
    * [[graft.operators.Similarity]] (same left-to-right accumulation
    * order, so bit-identical doubles; cross-check-tested). Norms run over
    * each full array, the dot product over the common prefix, mirroring
    * the HOF semantics exactly. */
  /** Deflate compression ratio of a UTF-8 text: compressed_bytes /
    * raw_bytes at zlib level 6 — the CCNet/Gopher-era "compressibility"
    * quality signal: template spam and boilerplate compress far below
    * natural prose (ratio ≲ 0.3), random bytes sit near 1. Runs the
    * JDK Deflater on the row's bytes in one call — a per-row CPU
    * kernel with zero state, so it belongs INSIDE whole-stage codegen
    * (a Scala UDF here would break the span on the corpus scan's hot
    * path). Determinism: zlib output is stable for a fixed level
    * within a JVM/zlib build; the SIGNAL (ratio band) is what
    * pipelines threshold on, and specs pin semantic bands, not bytes.
    * Empty input → ratio 1.0 (nothing to compress, nothing learned). */
  def deflateRatio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](1024)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length.toDouble
    } finally d.end()
  }

  /** All POSITIONAL word n-grams of a text (duplicates kept, in
    * order) — the instance-grain companion to [[ShinglesExpr]]'s
    * distinct shingles: lexical-diversity censuses (distinct-n) need
    * every occurrence, not the set. Same [[tokens]] convention
    * (lower/trim, \s+ split) with the [""] empty-input artifact
    * filtered; fewer than n tokens → empty array. One tight loop +
    * StringBuilder per row in whole-stage codegen — the interpreted
    * transform(sequence)+slice+array_join formulation it replaces was
    * the dominant cost of the corpus-grain diversity pass. */
  def ngramsValue(text: UTF8String, n: Int): ArrayData = {
    val raw = tokens(text)
    val ts = if (raw.length == 1 && raw(0).isEmpty) Array.empty[String]
      else raw
    if (ts.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ts.length - n + 1)
    var i = 0
    while (i <= ts.length - n) {
      if (n == 1) out(i) = UTF8String.fromString(ts(i))
      else {
        val sb = new java.lang.StringBuilder(ts(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ts(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Deflate→inflate roundtrip check: compresses the text's UTF-8
    * bytes at zlib level 6, decompresses the result, and returns the
    * decompressed byte length IF it reproduces the original bytes
    * exactly, else −1. This is the oracle seam for the zlib kernel
    * pair: DuckDB cannot replay deflate output, but it CAN compute
    * `strlen(text)` — so a query summing this roundtrip length per
    * group is hash-comparable against a plain byte-length sum, and any
    * corruption in either direction of the codec surfaces as a value
    * mismatch (q389; the banding signal itself stays spec-pinned in
    * q330). Empty input roundtrips to 0 trivially. */
  def deflateRoundtripLen(text: UTF8String): Long = {
    val raw = text.getBytes
    if (raw.length == 0) return 0L
    val d = new java.util.zip.Deflater(6)
    val compressed = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](4096)
      while (!d.finished()) {
        val n = d.deflate(buf)
        compressed.write(buf, 0, n)
      }
    } finally d.end()
    val inf = new java.util.zip.Inflater()
    val back = new java.io.ByteArrayOutputStream(raw.length + 32)
    try {
      inf.setInput(compressed.toByteArray)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return -1L
        back.write(buf, 0, n)
      }
    } catch { case _: java.util.zip.DataFormatException => return -1L
    } finally inf.end()
    val b = back.toByteArray
    if (java.util.Arrays.equals(raw, b)) b.length.toLong else -1L
  }

  /** Exact integer dot product over two array<bigint> vectors in one
    * tight primitive loop — value-identical to the long-summed
    * zip_with/aggregate formulation (same left-to-right accumulation
    * over the common prefix; exact integers make the order moot, but
    * the loop mirrors the HOF anyway). The interpreted HOF allocates a
    * 64-element intermediate array per pair; on an all-pairs scoring
    * sweep that allocation IS the cost (q320: 5.8 s → 1.6 s at sf0.1).
    * Capacity contract as [[graft.operators.Similarity
    * .mutualNearestNeighbors]]: |element| ≤ 10⁸ at 1000 dims. */
  def intDotValue(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var dot = 0L
    var i = 0
    while (i < n) { dot += a.getLong(i) * b.getLong(i); i += 1 }
    dot
  }

  def cosineValue(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var sa = 0.0
    i = 0
    while (i < na) { val x = a.getDouble(i); sa += x * x; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val y = b.getDouble(i); sb += y * y; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  /** PQ encode: argmin-L2² codebook entry per subspace, first-win ties
    * (== the declarative array_min over (dist, j) structs — strict `<`
    * keeps the smallest j among equal distances). `cb` is the FLAT
    * concatenation of the ksub full seed vectors (each `d` doubles), so
    * subspace s of entry j starts at j*d + s*(d/m); the inner
    * accumulation is the same left-to-right (x-y)² sum as the
    * zip_with/aggregate HOF, so codes are bit-identical to
    * [[graft.operators.Similarity.pqEncode]]'s declarative cross-check
    * — but in ONE codegen-resident loop instead of m·ksub interpreted
    * lambda frames per row, the per-row cost that dominates a corpus-
    * scale encode. */
  def pqCodesValue(v: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val d = v.numElements()
    val sd = d / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bj = 0
      var j = 0
      while (j < ksub) {
        var dist = 0.0
        val vo = s * sd
        val co = j * d + s * sd
        var t = 0
        while (t < sd) {
          val diff = v.getDouble(vo + t) - cb.getDouble(co + t)
          dist += diff * diff
          t += 1
        }
        if (dist < best) { best = dist; bj = j }
        j += 1
      }
      out(s) = bj
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC distance: m table lookups summed in subspace order over the
    * FLAT m×ksub distance table (row s starts at s*ksub). Same 0.0-seed
    * left-to-right accumulation as the declarative aggregate fold. */
  def pqAdcValue(codes: ArrayData, dt: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += dt.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** Duplicate-n-gram (repetition) ratio: 1 - distinct/total over raw
    * word n-grams — the Gopher-style internal-repetition quality signal.
    * Value-identical to the declarative rawShingles + array_distinct
    * formulation (exact string distinctness, 0.0 when no n-grams), but
    * one pass, no shingle-array materialization. */
  def repetitionValue(text: UTF8String, n: Int): Double = {
    val toks = tokens(text)
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    1.0 - seen.size.toDouble / total.toDouble
  }

  /** Binary search over a SORTED string-key array with aligned double
    * values — the broadcast-model lookup kernel. `element_at` on a
    * broadcast map is a LINEAR scan of ArrayBasedMapData, which turns a
    * 300-entry LM into ~90M string comparisons over a 300k-pair corpus
    * fold (measured 13.6s for q139 at sf0.1); binary search is O(log n)
    * per probe. Keys MUST be sorted by Spark's string ordering
    * (UTF8String binary compare — exactly what sort_array/array_sort
    * produce). Returns null on miss. */
  def sortedLookupValue(keys: ArrayData, vals: ArrayData, key: UTF8String): java.lang.Double = {
    var lo = 0
    var hi = keys.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val cmp = keys.getUTF8String(mid).compareTo(key)
      if (cmp == 0) return java.lang.Double.valueOf(vals.getDouble(mid))
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    null
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Content-defined chunking (CDC — the FastCDC/rsync idea lifted to
    * token granularity): the token stream splits AFTER every token whose
    * own md5 opens with a hex digit below `boundaryNibbles`, so a chunk
    * boundary depends only on local content, never on offsets. Insert or
    * delete one token and every chunk outside the touched one keeps its
    * digest — the property that makes chunk-level dedup storage
    * incremental, which offset-based (fixed-width) chunking lacks.
    * boundaryNibbles = b gives P(boundary) = b/16, mean chunk 16/b
    * tokens. One pass, codegen-friendly; the md5-prefix rule is chosen so
    * a SQL engine replays it verbatim (`substr(md5(tok), 1, 1) < hex(b)`).
    * Returns the chunks as space-joined strings in stream order. */
  def cdcChunksValue(text: UTF8String, boundaryNibbles: Int): ArrayData = {
    val toks = tokens(text)
    val md = md5Local.get()
    val out = new java.util.ArrayList[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < toks.length) {
      if (sb.length > 0) sb.append(' ')
      sb.append(toks(i))
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (((d(0) >> 4) & 0xf) < boundaryNibbles) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003) in one JVM
    * pass: md5-hex every k-gram, slide a w-wide window, keep each
    * window's lexicographic minimum; return the DISTINCT minima sorted —
    * value-identical to the declarative formulation in
    * [[graft.operators.Winnow.declarativeFingerprints]] (md5 hex is
    * ASCII, so String ordering == UTF8String binary ordering;
    * cross-checked in WinnowSpec). The declarative HOF path interprets
    * an md5 call per gram per row; this computes the same hashes in a
    * tight loop with an O(n) monotonic-deque sliding minimum and stays
    * inside whole-stage codegen. Empty/short texts -> empty array. */
  def winnowFpsValue(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = tokens(text)
    val nGrams = toks.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val md = md5Local.get()
    val hs = new Array[String](nGrams)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hs(i) = md5Hex(md, sb.toString)
      i += 1
    }
    val sel = new java.util.TreeSet[String]()
    if (nGrams <= w) {
      var min = hs(0)
      i = 1
      while (i < nGrams) { if (hs(i).compareTo(min) < 0) min = hs(i); i += 1 }
      sel.add(min)
    } else {
      // monotonic deque of indices whose hashes increase left-to-right
      val dq = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nGrams) {
        while (tail > head && hs(dq(tail - 1)).compareTo(hs(i)) >= 0) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(dq(head)))
        i += 1
      }
    }
    val out = new Array[AnyRef](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Within-doc repetition MASKING — the removal mate of
    * [[repetitionValue]]'s ratio (the Gopher rule flags a doc; this
    * repairs it): every n-gram occurrence whose gram already appeared
    * EARLIER in the same doc marks its n covered tokens; covered tokens
    * drop and the survivors re-join with single spaces. One pass, one
    * boolean cover array; docs shorter than n tokens pass through
    * normalized (lower/trim/ws-split, the pipeline convention). */
  def maskRepeatedValue(text: UTF8String, n: Int): UTF8String = {
    val toks = tokens(text)
    if (toks.length < n)
      return UTF8String.fromString(toks.mkString(" "))
    val seen = new java.util.HashSet[String]()
    val covered = new Array[Boolean](toks.length)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (!seen.add(sb.toString)) {
        var c = i
        while (c < i + n) { covered(c) = true; c += 1 }
      }
      i += 1
    }
    sb.setLength(0)
    i = 0
    while (i < toks.length) {
      if (!covered(i)) {
        if (sb.length > 0) sb.append(' ')
        sb.append(toks(i))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Intersection of two ASCENDING-sorted long arrays by two-pointer
    * merge — no per-call hash-set, no boxing beyond the result. The
    * dense-graph triangle close ([[graft.operators.Triangles]]) calls
    * this once per oriented edge, where `array_intersect`'s per-call
    * hash build was the dominant cost. */
  /** Token-level longest-common-subsequence length between two texts,
    * both token lists truncated to `cap` tokens first (the DP is
    * O(cap²) per pair — the cap IS the semantics, replayed by the
    * oracle, not a silent truncation). Tokens = whitespace split of
    * lower(trim(text)), the [[tokens]] convention shared with the
    * shingle/minhash family. Two-row DP, exact integers. */
  def lcsLenValue(a: UTF8String, b: UTF8String, cap: Int): Long = {
    def capped(t: UTF8String): Array[String] = {
      // drop the [""] artifact split("\s+") leaves on empty/whitespace
      // input: an empty side has ZERO tokens, so empty-vs-empty LCS is
      // 0, not 1 (mirrors Rouge.rougeL's n_tok filter)
      val raw = tokens(t)
      val ts = if (raw.length == 1 && raw(0).isEmpty) Array.empty[String]
        else raw
      if (ts.length > cap) java.util.Arrays.copyOf(ts, cap) else ts
    }
    val ta = capped(a)
    val tb = capped(b)
    val prev = new Array[Int](tb.length + 1)
    val cur = new Array[Int](tb.length + 1)
    var i = 0
    while (i < ta.length) {
      var j = 0
      while (j < tb.length) {
        cur(j + 1) =
          if (ta(i) == tb(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(tb.length).toLong
  }

  def sortedIntersectLongs(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Delta-varint pack of a STRICTLY-INCREASING sorted long array: the
    * first value zigzag-varint'd (ids may be negative), every
    * subsequent value as varint(delta) with delta >= 1. Dense
    * neighbor lists (graph adjacency) shrink ~4-6x vs 8 bytes/elem —
    * and a binary column rides joins as one memcpy'd blob, so the
    * per-edge adjacency traffic in [[graft.operators.Triangles]] stops
    * being the memory-bandwidth hog that GC-amplifies under load. */
  def packSortedLongs(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val buf = new Array[Byte](10 * n + 1)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var v = if (i == 0) (x << 1) ^ (x >> 63) else x - prev
      while ((v & ~0x7fL) != 0L) {
        buf(pos) = ((v & 0x7fL) | 0x80L).toByte; pos += 1; v >>>= 7
      }
      buf(pos) = v.toByte; pos += 1
      prev = x
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  /** Streaming decoder over [[packSortedLongs]] output. */
  private final class VarCursor(buf: Array[Byte]) {
    private var pos = 0
    private var cur = 0L
    private var first = true
    def hasNext: Boolean = pos < buf.length
    def next(): Long = {
      var shift = 0
      var v = 0L
      var b = 0L
      do {
        b = buf(pos) & 0xffL; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80L) != 0L)
      if (first) { first = false; cur = (v >>> 1) ^ -(v & 1L) }
      else cur += v
      cur
    }
  }

  /** Merge-intersection of two [[packSortedLongs]] streams, decoded on
    * the fly — no intermediate arrays, no hash set; output sized to
    * the (small) witness count and emitted as UnsafeArrayData (a
    * primitive-long blob — no per-element boxing even when a dense
    * graph yields 10^8 witnesses in aggregate). */
  def packedIntersectLongs(ab: Array[Byte], bb: Array[Byte]): ArrayData = {
    val ca = new VarCursor(ab)
    val cb = new VarCursor(bb)
    var out = new Array[Long](16)
    var k = 0
    if (ca.hasNext && cb.hasNext) {
      var x = ca.next()
      var y = cb.next()
      var done = false
      while (!done) {
        if (x == y) {
          if (k == out.length) out = java.util.Arrays.copyOf(out, k * 2)
          out(k) = x; k += 1
          if (ca.hasNext && cb.hasNext) { x = ca.next(); y = cb.next() }
          else done = true
        } else if (x < y) {
          if (ca.hasNext) x = ca.next() else done = true
        } else {
          if (cb.hasNext) y = cb.next() else done = true
        }
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** Field-wise max of two packed HLL register words — ten 6-bit
    * fields per long, the [[graft.operators.Graph.hyperAnf]] union
    * kernel. Each field is compared in place (values are non-negative
    * ranks ≤ 40 < 2^6), so the result is bit-identical to the unpacked
    * element-wise max. */
  def fieldMax6(a: Long, b: Long): Long = {
    var r = 0L
    var f = 0
    while (f < 10) {
      val sh = 6 * f
      val av = (a >>> sh) & 63L
      val bv = (b >>> sh) & 63L
      r |= (if (av >= bv) av else bv) << sh
      f += 1
    }
    r
  }

  /** Unpack a [[packSortedLongs]] blob back to the long array (spec
    * cross-check + any consumer needing the raw list). */
  def unpackSortedLongs(ab: Array[Byte]): ArrayData = {
    val c = new VarCursor(ab)
    var out = new Array[Long](16)
    var k = 0
    while (c.hasNext) {
      if (k == out.length) out = java.util.Arrays.copyOf(out, k * 2)
      out(k) = c.next(); k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  /** Column API. */
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    GraftShim.column(MinHashSigExpr(GraftShim.expression(text), n, k))

  def shingles(text: Column, n: Int): Column =
    GraftShim.column(ShinglesExpr(GraftShim.expression(text), n))

  def simhash(text: Column): Column =
    GraftShim.column(SimHash64Expr(GraftShim.expression(text)))

  def srpBucket(vec: Column, table: Int, planes: Int): Column =
    GraftShim.column(SrpBucketExpr(GraftShim.expression(vec), table, planes))

  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineExpr(GraftShim.expression(a), GraftShim.expression(b)))

  def intDot(a: Column, b: Column): Column =
    GraftShim.column(IntDotExpr(GraftShim.expression(a), GraftShim.expression(b)))

  def compressRatio(text: Column): Column =
    GraftShim.column(DeflateRatioExpr(GraftShim.expression(text)))

  def deflateRoundtrip(text: Column): Column =
    GraftShim.column(DeflateRoundtripExpr(GraftShim.expression(text)))

  def ngrams(text: Column, n: Int): Column =
    GraftShim.column(NgramsExpr(GraftShim.expression(text), n))

  def sortedLookup(keys: Column, vals: Column, key: Column): Column =
    GraftShim.column(SortedLookupExpr(GraftShim.expression(keys),
      GraftShim.expression(vals), GraftShim.expression(key)))

  def repetitionRatio(text: Column, n: Int): Column =
    GraftShim.column(RepetitionExpr(GraftShim.expression(text), n))

  def cdcChunks(text: Column, boundaryNibbles: Int): Column =
    GraftShim.column(CdcChunksExpr(GraftShim.expression(text), boundaryNibbles))

  def winnowFps(text: Column, k: Int, w: Int): Column =
    GraftShim.column(WinnowFpsExpr(GraftShim.expression(text), k, w))

  def maskRepeated(text: Column, n: Int): Column =
    GraftShim.column(MaskRepeatedExpr(GraftShim.expression(text), n))

  def bloomProbe(key: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    GraftShim.column(BloomProbeExpr(GraftShim.expression(key), bloom))

  def sortedIntersect(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectExpr(GraftShim.expression(a), GraftShim.expression(b)))

  def packSorted(a: Column): Column =
    GraftShim.column(PackSortedExpr(GraftShim.expression(a)))

  def packedIntersect(a: Column, b: Column): Column =
    GraftShim.column(PackedIntersectExpr(GraftShim.expression(a),
      GraftShim.expression(b)))

  def unpackSorted(a: Column): Column =
    GraftShim.column(UnpackSortedExpr(GraftShim.expression(a)))

  def pqCodes(v: Column, cbFlat: Column, m: Int, ksub: Int): Column =
    GraftShim.column(PqCodesExpr(GraftShim.expression(v),
      GraftShim.expression(cbFlat), m, ksub))

  def pqAdc(codes: Column, dtFlat: Column, ksub: Int): Column =
    GraftShim.column(PqAdcExpr(GraftShim.expression(codes),
      GraftShim.expression(dtFlat), ksub))

  def tokenLcs(a: Column, b: Column, cap: Int): Column =
    GraftShim.column(TokenLcsExpr(GraftShim.expression(a),
      GraftShim.expression(b), cap))

  def fieldMax6Agg(w: Column): Column =
    GraftShim.column(FieldMax6Agg(GraftShim.expression(w))
      .toAggregateExpression())
}

/** (packed word, packed word) -> field-wise max ([[FastHash.fieldMax6]]).
  * The scalar kernel [[FieldMax6Agg]] folds with. */
case class FieldMax6Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_field_max6_word"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FastHash.fieldMax6(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.fieldMax6($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FieldMax6Expr =
    copy(left = newLeft, right = newRight)
}

/** Per-group field-wise max over ONE packed 6-bit×10 register word —
  * the HyperANF union as a DECLARATIVE aggregate on a single LONG
  * buffer slot: the planner keeps whole-stage-codegen HashAggregate
  * with map-side partial aggregation. The typed-Aggregator form this
  * replaces (r13's `RegMax` over the whole array) forced
  * ObjectHashAggregate through a Seq[Long] encoder that boxed every
  * word of every edge-grain row on both the update and merge paths.
  * A null input word is a no-op (zero = the empty register word). */
case class FieldMax6Agg(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, If, IsNull, Literal}

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_field_max6"

  private lazy val fmax =
    AttributeReference("fmax6", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(fmax)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(If(IsNull(child), fmax, FieldMax6Expr(fmax, child)))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(FieldMax6Expr(fmax.left, fmax.right))
  override lazy val evaluateExpression: Expression = fmax

  override protected def withNewChildInternal(
      newChild: Expression): FieldMax6Agg = copy(child = newChild)
}

/** (text, text) -> token-LCS length, both sides capped at `cap` tokens
  * ([[FastHash.lcsLenValue]]; the ROUGE-L kernel). */
case class TokenLcsExpr(left: Expression, right: Expression, cap: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_lcs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FastHash.lcsLenValue(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.lcsLenValue($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcsExpr =
    copy(left = newLeft, right = newRight)
}

/** (sorted array<bigint>, sorted array<bigint>) -> sorted array<bigint>
  * intersection ([[FastHash.sortedIntersectLongs]]). */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FastHash.sortedIntersectLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.sortedIntersectLongs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** (strictly-increasing sorted array<bigint>) -> delta-varint binary
  * ([[FastHash.packSortedLongs]]): the compact adjacency form — joins
  * ship one blob memcpy instead of 8 bytes/neighbor. */
case class PackSortedExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_pack_sorted"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.packSortedLongs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.FastHash.packSortedLongs($a)")

  override protected def withNewChildInternal(
      newChild: Expression): PackSortedExpr = copy(child = newChild)
}

/** (packed binary, packed binary) -> sorted array<bigint> intersection,
  * decoded on the fly ([[FastHash.packedIntersectLongs]]) — no
  * intermediate array materialization. */
case class PackedIntersectExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_packed_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FastHash.packedIntersectLongs(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.packedIntersectLongs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** (packed binary) -> sorted array<bigint> round-trip
  * ([[FastHash.unpackSortedLongs]]). */
case class UnpackSortedExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unpack_sorted"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.unpackSortedLongs(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.FastHash.unpackSortedLongs($a)")

  override protected def withNewChildInternal(
      newChild: Expression): UnpackSortedExpr = copy(child = newChild)
}

/** text -> array<bigint> of k minhashes (null when < n tokens). */
case class MinHashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.minhashSig(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.FastHash.minhashSig($c, $n, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** text -> array<string> of distinct word n-gram shingles. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.shinglesValue(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastHash.shinglesValue($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** text -> all positional word n-grams, duplicates kept (codegen'd;
  * see [[FastHash.ngramsValue]]). */
case class NgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1: $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.ngramsValue(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastHash.ngramsValue($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramsExpr =
    copy(child = newChild)
}

/** array<double> vector -> SRP-LSH bucket id (planes sign bits). */
case class SrpBucketExpr(child: Expression, table: Int, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_bucket"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.srpBucketValue(input.asInstanceOf[ArrayData], table, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastHash.srpBucketValue($c, $table, $planes)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)
}

/** (array<double>, array<double>) -> cosine similarity. */
case class CosineExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FastHash.cosineValue(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.cosineValue($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

/** text -> deflate compression ratio (codegen'd; see
  * [[FastHash.deflateRatio]]). */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_compress_ratio"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastHash.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

/** text -> deflate→inflate roundtrip byte length, −1 on any mismatch
  * (codegen'd; see [[FastHash.deflateRoundtripLen]]). */
case class DeflateRoundtripExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_roundtrip"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.deflateRoundtripLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastHash.deflateRoundtripLen($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateRoundtripExpr =
    copy(child = newChild)
}

/** array<bigint> x array<bigint> -> exact long dot product (codegen'd;
  * see [[FastHash.intDotValue]] for the capacity contract). */
case class IntDotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FastHash.intDotValue(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.intDotValue($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

/** text -> 64-bit simhash fingerprint. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** bigint key -> bloom-filter membership probe (boolean). The filter
  * travels as a broadcast referenced from generated code, so the probe
  * stays INSIDE whole-stage codegen — a Scala UDF here would break the
  * codegen span on the big side's hot path, the dominant per-row cost of
  * a 100 TB decontamination scan ([[graft.operators.Bloom]]). */
case class BloomProbeExpr(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}

/** (sorted array<string> keys, array<double> vals, string key) -> double
  * or null — O(log n) broadcast-model lookup (see
  * [[FastHash.sortedLookupValue]]). */
case class SortedLookupExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_lookup"

  override protected def nullSafeEval(ks: Any, vs: Any, k: Any): Any =
    FastHash.sortedLookupValue(ks.asInstanceOf[ArrayData],
      vs.asInstanceOf[ArrayData], k.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.FastHash.sortedLookupValue($a, $b, $c);
         |${ev.isNull} = ${ev.value}_r == null;
         |if (!${ev.isNull}) { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SortedLookupExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** text -> duplicate-n-gram repetition ratio (double, 0.0 for short text). */
case class RepetitionExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.repetitionValue(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastHash.repetitionValue($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionExpr =
    copy(child = newChild)
}

/** text -> array<string> of content-defined chunks (space-joined tokens;
  * boundary after tokens whose md5 starts below `boundaryNibbles`). */
case class CdcChunksExpr(child: Expression, boundaryNibbles: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.cdcChunksValue(input.asInstanceOf[UTF8String], boundaryNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastHash.cdcChunksValue($c, $boundaryNibbles)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** text -> array<string> of distinct sorted winnowing fingerprints
  * (md5-hex window minima, k-gram / w-window). */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.winnowFpsValue(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastHash.winnowFpsValue($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

/** (vector, flat codebook) -> PQ codes array<int>
  * ([[FastHash.pqCodesValue]]). */
case class PqCodesExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    FastHash.pqCodesValue(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.pqCodesValue($a, $b, $m, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodesExpr =
    copy(left = newLeft, right = newRight)
}

/** (codes, flat distance table) -> ADC distance
  * ([[FastHash.pqAdcValue]]). */
case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(codes: Any, dt: Any): Any =
    FastHash.pqAdcValue(codes.asInstanceOf[ArrayData],
      dt.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.FastHash.pqAdcValue($a, $b, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** text -> text with later occurrences of repeated within-doc n-grams
  * masked out (normalized tokens, single-space joined). */
case class MaskRepeatedExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_mask_repeated"

  override protected def nullSafeEval(input: Any): Any =
    FastHash.maskRepeatedValue(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastHash.maskRepeatedValue($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MaskRepeatedExpr =
    copy(child = newChild)
}
