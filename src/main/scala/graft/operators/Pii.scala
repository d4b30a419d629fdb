package graft.operators

import org.apache.spark.sql.DataFrame
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
}
