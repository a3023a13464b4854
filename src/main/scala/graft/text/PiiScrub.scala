package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines (SURVEY.md §2.7): the
  * standard pre-training redaction pass (emails, SSNs, credit cards,
  * IPv4 addresses, phone numbers) as pure codegen'd column functions —
  * a chain of `regexp_replace` calls, no UDFs, so the scrub stays
  * inside whole-stage codegen and runs in one projection over the
  * corpus scan (zero shuffles).
  *
  * The patterns are the widely-published conservative ones (precision
  * over recall — a scrubber that eats ordinary numbers destroys
  * training data). Rule order matters and is fixed: more-specific
  * shapes first so a credit card is tagged <CC> rather than half-eaten
  * by the phone rule; each replacement tag contains no digits, so later
  * rules cannot re-match inside an earlier rule's output.
  *
  * The synthetic `documents` corpus contains no PII by construction,
  * so this seat is spec-covered on planted inputs (PiiBpeSpec)
  * rather than oracle-checked — a zero-match oracle row would be
  * vacuously green. [[surrogateKey]] backs the oracle-checked
  * q_pseudonymize, which has full signal on `customer`.
  */
object PiiScrub {

  /** (rule name, Java regex, replacement tag), applied in order. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("credit_card", "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b", "<CC>"),
    ("ipv4", "\\b(?:(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}" +
      "(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\b", "<IP>"),
    // (?<![\d-]) instead of a leading \b: the match may start at "(" or
    // "+", where \b never holds between the preceding space and the
    // punctuation — a \b-anchored rule silently drops the paren/plus
    // from the match. The required [ .-] before the last 4 digits keeps
    // bare 10-digit integers (ids, amounts) out.
    ("phone", "(?<![\\d-])(?:\\+?1[ .-]?)?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]\\d{4}\\b",
      "<PHONE>"))

  /** All rules applied in order — one codegen'd projection. */
  def scrub(c: Column): Column =
    rules.foldLeft(c) { case (acc, (_, re, tag)) => regexp_replace(acc, re, tag) }

  /** Per-rule match counts over the RAW text as a struct column
    * (fields = rule names) — the audit side of the scrub. Counts are
    * independent per rule; the rules are shaped to be disjoint on
    * realistic text (spec'd on planted inputs).
    */
  def stats(c: Column): Column =
    struct(rules.map { case (name, re, _) => regexp_count(c, lit(re)).as(name) }: _*)

  /** Deterministic pseudonymization surrogate: a truncated md5 of the
    * identifier (optionally salted). Deterministic ⇒ referentially
    * consistent — every table mapping the same identifier gets the
    * same surrogate, so joins still line up after scrubbing; truncation
    * keeps the key compact (12 hex chars = 48 bits; collision risk
    * ~n²/2^49 — raise `hexLen` for corpora beyond ~10M distinct keys).
    */
  def surrogateKey(c: Column, salt: String = "", hexLen: Int = 12): Column =
    substring(md5(if (salt.isEmpty) c else concat(lit(salt), c)), 1, hexLen)
}
