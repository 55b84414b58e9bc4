package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text cleaning for training-data pipelines: PII redaction (emails, IPv4
  * addresses, phone-like digit runs) as pure regex rewrites — the standard
  * pre-training scrub pass (e.g. C4/RefinedWeb-style pipelines run exactly
  * this family of rules before anything model-based).
  *
  * Everything is `regexp_replace`/`regexp_extract_all` over codegen'd
  * built-ins: map-only, no shuffle, scales linearly with the corpus. The
  * patterns are deliberately RE2-safe (no backreferences, no lookaround) so
  * the DuckDB oracle runs the LITERAL same patterns — Java and RE2 agree on
  * this subset.
  *
  * Rule order matters and is fixed: emails first (an address contains
  * dot-separated tokens a later rule could shred), then IPv4 (dotted quads
  * would otherwise partially match the phone rule's digit runs), then phone.
  */
object Cleaning {

  /** (pattern, replacement) in application order — shared with the oracle. */
  val PiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("\\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"))

  /** Text with all PII rules applied in order. */
  def scrub(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** Match count for one rule BEFORE any rewriting. */
  def hits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Per-document scrub report: counts per rule + the cleaned text. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      hits(col(textCol), PiiRules(0)._1).cast("long").as("n_emails"),
      hits(col(textCol), PiiRules(1)._1).cast("long").as("n_ips"),
      hits(col(textCol), PiiRules(2)._1).cast("long").as("n_phones"),
      scrub(col(textCol)).as("clean_text"))
}
