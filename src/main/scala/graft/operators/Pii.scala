package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the compliance pass a corpus pipeline runs before
  * anything ships: mask emails, NANP-style phone numbers, and IPv4
  * addresses, and report how much was found where (the census is what
  * a privacy review reads; the masked text is what training sees).
  *
  * Pure projection — regexp_count/regexp_replace are codegen'd, no
  * shuffle, no UDF. Patterns are RE2-safe (no lookbehind, ASCII \b), so
  * any engine replays them; masking order (email, phone, ip) is fixed
  * and part of the replay contract. Counts are
  * taken on the ORIGINAL text per category. This is pattern-based
  * scrubbing: it makes no NER-grade recall claim — it is the cheap
  * always-on layer, not the last line of defense. */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Adds `n_emails`, `n_phones`, `n_ips`, and `scrubbed` (masked
    * text) to `df`. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(emailRe)))
      .withColumn("n_phones", regexp_count(t, lit(phoneRe)))
      .withColumn("n_ips", regexp_count(t, lit(ipRe)))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(regexp_replace(t,
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>"))
  }

  /** Card-number candidates: the 4-4-4-4 grouped form (space or dash)
    * or a bare 13–19 digit run. Both alternations are leftmost-first in
    * Java regex AND RE2, so any engine extracts the identical spans. */
  val ccCandRe: String = "\\b(?:\\d{4}[ -]){3}\\d{4}\\b|\\b\\d{13,19}\\b"

  /** Luhn mod-10 over a candidate string's digits (non-digits stripped):
    * from the right, every second digit doubles (minus 9 when > 9); the
    * total must divide by 10. Pure codegen HOFs — transform with index +
    * aggregate — no UDF, and the arithmetic is integral so any engine
    * replays it exactly. */
  def luhnValid(cand: Column): Column = {
    val ds = split(regexp_replace(cand, "[^0-9]", ""), "")
    val n = size(ds)
    val terms = transform(ds, (c, i) => {
      val d = c.cast("int")
      val doubled = d * 2
      when(((n - lit(1) - i) % 2) === 1,
        when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
    })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Checksum-validated card scrubbing — the precision layer a digit
    * regex alone cannot give: a 16-digit order id is a candidate but
    * fails Luhn, so it is COUNTED (`n_cc_invalid`) and left alone, while
    * Luhn-passing numbers are masked. Adds `n_cc_cands`, `n_cc_valid`,
    * `n_cc_invalid`, and `cc_scrubbed`. Pure projection: extraction,
    * validation (HOF filter), and masking (fold of plain replaces over
    * the valid list) are all codegen'd; no shuffle, no UDF. */
  def luhnScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val cands = regexp_extract_all(t, lit(ccCandRe), lit(0))
    df.withColumn("__cands", cands)
      .withColumn("__valid", filter(col("__cands"), luhnValid _))
      .withColumn("n_cc_cands", size(col("__cands")))
      .withColumn("n_cc_valid", size(col("__valid")))
      .withColumn("n_cc_invalid", size(col("__cands")) - size(col("__valid")))
      .withColumn("cc_scrubbed",
        aggregate(col("__valid"), t, (acc, x) => replace(acc, x, lit("<CC>"))))
      .drop("__cands", "__valid")
  }
}
