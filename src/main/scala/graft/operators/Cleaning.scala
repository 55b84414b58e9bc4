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

  /** CCNet-style boilerplate removal at SEGMENT granularity: cut every
    * document into fixed `windowTokens`-token segments ([[Chunker.chunk]],
    * zero overlap), call a segment boilerplate when its exact text occurs in
    * more than `maxDocs` DISTINCT documents (headers, footers, navigation,
    * license blurbs), and rebuild each document from its surviving segments
    * in order. Output: (id, n_chunks, n_dropped, clean_text) — clean_text is
    * "" when every segment was boilerplate.
    *
    * This is the REMOVAL counterpart of [[Dedup.chunkDupStats]] (which only
    * measures): document-level dedup keeps one copy of a shared footer per
    * document pair; this deletes it everywhere once it crosses the document
    * count threshold.
    *
    * Plan shape at 100 TB: chunking is a map-only explode; the hot-segment
    * dictionary is one shuffle on segment text bounded by distinct-segment
    * cardinality (count-distinct of ids partially aggregates), and at
    * corpus scale the dictionary (segments in > maxDocs docs) is small —
    * the join back is broadcastable. Reassembly shuffles (id, chunk) rows
    * once. Segment keys could hash to 16 bytes before the shuffle if
    * windows are long.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       windowTokens: Int, maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val chunks = Chunker.chunk(df, idCol, textCol, windowTokens, overlap = 0)
    val hot = chunks.groupBy("chunk_text")
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") > maxDocs)
      .select(col("chunk_text"), lit(1L).as("__hot"))
    chunks.join(hot, Seq("chunk_text"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("__hot"), lit(0L))).cast("long").as("n_dropped"),
        // collect_list skips nulls, so the when() keeps only clean segments;
        // sort_array orders the structs by chunk_id (first field)
        array_join(transform(
          sort_array(collect_list(when(col("__hot").isNull,
            struct(col("chunk_id"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("clean_text"))
  }

  /** Right-to-be-forgotten erasure cascade over a set of user-keyed tables:
    * every table drops ALL rows of the requested users, and the audit the
    * deletion job must produce (per table: rows before / removed / after,
    * plus how many distinct requested users actually had rows there) comes
    * back as the result. The erasure itself is a broadcast anti-join per
    * table — the request list is tiny next to any 100 TB fact table, the
    * fact tables never shuffle, and each table is scanned once (the audit
    * aggregates the join flag rather than re-counting survivors).
    *
    * `tables` maps a table label to (DataFrame, user-id column). Request ids
    * are deduplicated — repeated GDPR tickets for the same user don't
    * double-count.
    */
  def eraseUsers(requests: DataFrame, reqCol: String,
                 tables: Seq[(String, (DataFrame, String))]): DataFrame = {
    require(tables.nonEmpty, "eraseUsers needs at least one table")
    val req = requests.select(col(reqCol).as("__req_id")).distinct()
    tables.map { case (label, (df, userCol)) =>
      df.select(col(userCol).as("__uid"))
        .join(broadcast(req.withColumn("__del", lit(1L))),
          col("__uid") === col("__req_id"), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          sum(coalesce(col("__del"), lit(0L))).cast("long").as("rows_removed"),
          count_distinct(when(col("__del") === 1L, col("__uid"))).as("users_hit"))
        .select(lit(label).as("table_name"), col("rows_before"),
          col("rows_removed"),
          (col("rows_before") - col("rows_removed")).as("rows_after"),
          col("users_hit"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }
}
