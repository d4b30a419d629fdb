package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pii

class PiiSpec extends AnyFunSuite with SparkFixture {

  private def scrubOne(t: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val r = Pii.scrub(Seq(t).toDF("t"), "t").collect().head
    (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"),
      r.getAs[Int]("n_ips"), r.getAs[String]("scrubbed"))
  }

  test("masks each category, counts on original text, mask order holds") {
    assert(scrubOne("write a+b.c%d@sub.ex-ample.org now") ===
      ((1, 0, 0, "write <EMAIL> now")))
    assert(scrubOne("call 415-555-1234 or 650-555-0000") ===
      ((0, 2, 0, "call <PHONE> or <PHONE>")))
    assert(scrubOne("host 10.0.0.1 and 192.168.255.255!") ===
      ((0, 0, 2, "host <IP> and <IP>!")))
    // an IP-hosted address is NOT an email by this pattern (no alpha
    // TLD) — the IP inside it still masks
    val (e, _, ip, s) = scrubOne("bob@192.168.0.1 plus bare 10.0.0.7")
    assert(e == 0 && ip == 2 && s == "bob@<IP> plus bare <IP>")
    // word boundaries: digits embedded in longer runs are not phones
    assert(scrubOne("id 1415-555-12345 stays")._2 == 0)
  }

  test("clean text passes through untouched") {
    assert(scrubOne("no pii here at all") === ((0, 0, 0, "no pii here at all")))
  }

  private def luhnOne(text: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val r = Pii.luhnScrub(Seq(text).toDF("text"), "text").head()
    (r.getAs[Int]("n_cc_cands"), r.getAs[Int]("n_cc_valid"),
      r.getAs[Int]("n_cc_invalid"), r.getAs[String]("cc_scrubbed"))
  }

  test("luhnScrub masks checksum-valid cards and spares Luhn-failing decoys") {
    // valid 16-digit, bare and dashed
    assert(luhnOne("pay 4111111111111111 now") ===
      ((1, 1, 0, "pay <CC> now")))
    assert(luhnOne("pay 4111-1111-1111-1111 now") ===
      ((1, 1, 0, "pay <CC> now")))
    // valid 15-digit (amex-shaped)
    assert(luhnOne("pay 340000000000009 now") === ((1, 1, 0, "pay <CC> now")))
    // a 16-digit order id that FAILS the checksum: candidate, not masked
    assert(luhnOne("order 1234567812345678 ref") ===
      ((1, 0, 1, "order 1234567812345678 ref")))
    // mixed: one of each
    assert(luhnOne("a 4111111111111111 b 4111111111111112 c") ===
      ((2, 1, 1, "a <CC> b 4111111111111112 c")))
    // too short / too long digit runs are not candidates
    assert(luhnOne("num 123456781234 and 12345678123456781234")._1 == 0)
    // clean text untouched
    assert(luhnOne("no cards here") === ((0, 0, 0, "no cards here")))
  }
}
