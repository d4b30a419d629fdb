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
}
