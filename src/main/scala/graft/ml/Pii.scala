package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — the scrubbing stage every training-data
 * pipeline runs before text leaves curation. Regex-class based: emails,
 * phone numbers, IPv4 addresses, SSN-shaped ids, and 16-digit card
 * numbers, each detected (per-class match counts) or redacted (replaced
 * by a class token like `<EMAIL>`).
 *
 * Cross-engine contract: every pattern below is valid and semantically
 * identical in Java regex (Spark) and RE2 (DuckDB) — no backreferences,
 * no lookaround — so the oracle queries replay both the counts and the
 * redacted-text md5 exactly. Patterns are deliberately conservative
 * (high precision over recall): a training-corpus scrubber that
 * over-matches digits mangles code and tables, which is its own data-
 * quality bug.
 *
 * Scale shape: pure per-row projection — no shuffle, no UDF; the regex
 * work runs inside whole-stage codegen via the native string
 * expressions. At 100 TB that means PII scrubbing costs one scan and
 * pipelines with whatever runs next.
 *
 * No counterpart in the reference (its actor set stops at relational
 * transforms); the class list follows the public data-curation
 * literature on pre-training scrubbing.
 */
object Pii {

  /** (class name, pattern, replacement token), applied in this order —
   *  SSN before phone (3-2-4 vs 3-3-4 digit groups are disjoint, but a
   *  fixed order makes the composition deterministic by construction). */
  val classes: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("cc", "\\b\\d{16}\\b", "<CC>"))

  /** Per-document PII class counts + total. Output: (idCol, n_email,
   *  n_ssn, n_phone, n_ip, n_cc, n_pii). Counts are independent per
   *  class (each runs on the ORIGINAL text). */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text counts as ZERO matches, not null counts — regexp_count
    // propagates null, which would null n_pii and silently pass any
    // downstream `n_pii <= k` threshold gate
    val t = coalesce(col(textCol), lit(""))
    val counts = classes.map { case (name, pat, _) =>
      regexp_count(t, lit(pat)).cast("long").as(s"n_$name")
    }
    val total = classes.map { case (name, _, _) => col(s"n_$name") }
      .reduce(_ + _).as("n_pii")
    df.select(col(idCol) +: counts: _*)
      .select(col(idCol), col("n_email"), col("n_ssn"), col("n_phone"),
        col("n_ip"), col("n_cc"), total)
  }

  /** Redact every class in order; output (idCol, redacted text column,
   *  n_redacted = total matches replaced). Replacement tokens contain no
   *  digits or '@', so later classes can never match inside an earlier
   *  class's token — the composition is confluent.
   *
   *  `n_redacted` counts each class on the PROGRESSIVELY-redacted text
   *  (what that class's replace actually sees), not the original: an
   *  earlier replacement can EXPOSE a later-class match — e.g. in
   *  `"a@b.co1.2.3.4"` the IP's `\b` fails on the original (`o`→`1` is
   *  word-to-word) but matches after `<EMAIL>` is spliced in — so
   *  counting the original would under-report the substitutions made. */
  def redact(df: DataFrame, idCol: String, textCol: String,
             outCol: String = "redacted"): DataFrame = {
    // null text passes through as null (redacting an absent document
    // yields an absent document) with a ZERO count (see detect)
    val (redacted, total) =
      classes.foldLeft((col(textCol), lit(0L).cast("long"): Column)) {
        case ((c, cnt), (_, pat, tok)) =>
          (regexp_replace(c, lit(pat), lit(tok)),
           cnt + regexp_count(coalesce(c, lit("")), lit(pat)).cast("long"))
      }
    df.select(col(idCol), redacted.as(outCol), total.as("n_redacted"))
  }
}
