package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Chunker

/** Contract of [[Chunker]] content-defined chunking (q147 covers the
  * cross-engine census): chunks reassemble to the token stream, the
  * boundary rule is the documented md5-prefix predicate, and — the whole
  * point of CDC — an edit disturbs only the chunk it lands in, while
  * offset-based chunking re-digests everything downstream. */
class ChunkerSpec extends AnyFunSuite with SparkFixture {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunks concatenate back to the normalized token stream") {
    import spark.implicits._
    val df = Seq((1L, "The quick  Brown fox JUMPS over the lazy dog now")).toDF("id", "text")
    val chunks = Chunker.contentDefinedChunks(df, "id", "text")
      .orderBy("chunk_idx").collect()
    val rejoined = chunks.map(_.getAs[String]("chunk")).mkString(" ")
    assert(rejoined == "the quick brown fox jumps over the lazy dog now")
    // chunk_tokens matches each chunk's own token count
    chunks.foreach { r =>
      assert(r.getAs[Long]("chunk_tokens") ==
        r.getAs[String]("chunk").split(" ").length.toLong)
    }
  }

  test("boundaries are exactly the tokens whose md5 opens below the nibble threshold") {
    import spark.implicits._
    val toks = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
    val chunks = Chunker.contentDefinedChunks(df, "id", "text", boundaryNibbles = 4)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk"))
    // reference chunker: split after tokens with md5 first hex < '4'
    val expected = scala.collection.mutable.Buffer[String]()
    val cur = scala.collection.mutable.Buffer[String]()
    toks.foreach { t =>
      cur += t
      if (md5Hex(t).head < '4') { expected += cur.mkString(" "); cur.clear() }
    }
    if (cur.nonEmpty) expected += cur.mkString(" ")
    assert(chunks.toSeq == expected.toSeq)
    assert(chunks.length > 1, "fixture must actually split")
  }

  test("an edit disturbs only its own chunk (the incremental-dedup property)") {
    import spark.implicits._
    val base = (0 until 200).map(i => s"tok${i % 37} word${i % 23}").mkString(" ")
    // mutate one token in the middle
    val edited = {
      val t = base.split(" ").toBuffer
      t(199) = "MUTATED"
      t.mkString(" ")
    }
    val df = Seq((1L, base), (2L, edited)).toDF("id", "text")
    val ch = Chunker.contentDefinedChunks(df, "id", "text")
    val a = ch.where($"id" === 1L).collect().map(_.getAs[String]("digest")).toSet
    val b = ch.where($"id" === 2L).collect().map(_.getAs[String]("digest")).toSet
    val nA = a.size
    // all but a bounded neighborhood of the edit survives unchanged
    assert((a intersect b).size >= nA - 3,
      s"edit invalidated ${nA - (a intersect b).size} of $nA chunks")
    assert(a != b, "the edited chunk must change digest")
  }

  test("census accounting: n_chunks = n_distinct + dup_occurrences, dups fire on copies") {
    import spark.implicits._
    val d = Seq((1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
      (2L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
      (3L, "zz yy xx ww vv uu tt ss rr qq")).toDF("id", "text")
    val census = Chunker.chunkDedupCensus(d, "id", "text").collect()
    census.foreach { r =>
      assert(r.getAs[Long]("n_chunks") ==
        r.getAs[Long]("n_distinct") + r.getAs[Long]("dup_occurrences"))
    }
    assert(census.map(_.getAs[Long]("dup_occurrences")).sum > 0,
      "doc 2 duplicates doc 1 — the census must see it")
  }
}
