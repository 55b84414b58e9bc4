package graft.functions.bpe

import scala.collection.mutable

/** Byte-level byte-pair encoding, the GPT-2 tokenizer algorithm (Sennrich et
  * al., "Neural machine translation of rare words with subword units", ACL
  * 2016; byte-level variant per Radford et al., GPT-2, 2019) — the faithful
  * counterpart to the reference's tiktoken `cl100k_base` length guard
  * (reference `vectrekker/main.py:170,175,178`):
  *
  *  1. pre-tokenize with the published GPT-2 regex (contractions, letter
  *     runs, digit runs, punctuation runs, trailing-space handling);
  *  2. map each pre-token's UTF-8 bytes through the GPT-2 byte↔unicode
  *     table (every byte gets a printable char, so merges are string ops);
  *  3. repeatedly merge the adjacent symbol pair with the LOWEST merge rank
  *     until no ranked pair remains.
  *
  * The MERGE TABLE is pluggable: [[BpeTokenizer.fromMerges]] accepts the
  * standard `merges.txt` line format, so OpenAI's published GPT-2 vocab (or
  * any table in that format) drops in unchanged. This build environment has
  * no network and no vocab file on disk, so the shipped [[BpeTokenizer.default]]
  * trains a small deterministic table from an embedded seed text at class
  * init — a REAL BPE (the algorithm, token ids, and round-trip guarantee are
  * exactly GPT-2's), with a miniature vocabulary. Token ids: 0–255 are the
  * base byte alphabet (in GPT-2's byte-order convention), 256+r is the
  * symbol produced by merge rank r — the same id scheme as the published
  * encoder files.
  *
  * Byte-level BPE is lossless: `decode(encode(s)) == s` for every string
  * (property-tested), unlike word-level tokenizers that drop OOV content.
  */
final class BpeTokenizer(val merges: Vector[(String, String)]) extends Serializable {

  @transient private lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** symbol string -> token id (base alphabet then merges, GPT-2 scheme).
    * Two merge rules can produce the SAME concatenation (e.g. (a,bc) and
    * (ab,c) both yield "abc") — keep the EARLIEST rank's id so encode is
    * deterministic and matches the published encoders' first-wins layout.
    */
  @transient private lazy val vocab: Map[String, Int] = {
    val base = BpeTokenizer.byteAlphabet.zipWithIndex.map { case (c, i) => c.toString -> i }
    val merged = merges.zipWithIndex.map { case ((a, b), r) => (a + b) -> (256 + r) }
    // toMap keeps the LAST entry per key; reverse the merge list so the
    // earliest rank wins on collision (base keys are single chars, merged
    // keys are >= 2 chars — the two never collide with each other)
    (base ++ merged.reverse).toMap
  }

  /** id -> symbol string, TOTAL over all valid ids: every merge rank decodes
    * to its concatenation even when a later rank shadowed it in [[vocab]] —
    * decode of an arbitrary well-formed id sequence never throws.
    */
  @transient private lazy val inverse: Map[Int, String] = {
    val base = BpeTokenizer.byteAlphabet.zipWithIndex.map { case (c, i) => i -> c.toString }
    val merged = merges.zipWithIndex.map { case ((a, b), r) => (256 + r) -> (a + b) }
    (base ++ merged).toMap
  }

  // per-pre-token memo — real corpora repeat pre-tokens heavily (GPT-2's
  // reference implementation does the same); bounded to keep executors honest
  @transient private lazy val cache = new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()

  private def bpe(word: Vector[String]): Vector[String] = {
    var w = word
    var continue = w.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx  = -1
      var i = 0
      while (i < w.length - 1) {
        val r = ranks.getOrElse((w(i), w(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        // merge EVERY occurrence of the chosen pair left-to-right
        val (a, b) = (w(bestIdx), w(bestIdx + 1))
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < w.length) {
          if (j < w.length - 1 && w(j) == a && w(j + 1) == b) { out += (a + b); j += 2 }
          else { out += w(j); j += 1 }
        }
        w = out.result()
        continue = w.length > 1
      }
    }
    w
  }

  private def symbolsOf(preToken: String): Vector[String] = {
    val hit = cache.get(preToken)
    if (hit != null) hit
    else {
      val sym = bpe(preToken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .toVector.map(b => BpeTokenizer.byteToChar(b & 0xFF).toString))
      if (cache.size < 50000) cache.put(preToken, sym)
      sym
    }
  }

  def encode(text: String): Vector[Int] =
    BpeTokenizer.preTokenize(text).flatMap(pt => symbolsOf(pt).map(vocab))

  def countTokens(text: String): Int =
    BpeTokenizer.preTokenize(text).map(pt => symbolsOf(pt).length).sum

  def decode(ids: Seq[Int]): String = {
    val chars = ids.map(inverse).mkString
    val bytes = chars.map(BpeTokenizer.charToByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  def vocabSize: Int = 256 + merges.length
}

object BpeTokenizer {

  /** The published GPT-2 pre-tokenization pattern (translated to Java regex:
    * possessive contractions, optional-space letter/digit/punct runs, spaces
    * kept with the FOLLOWING word, trailing whitespace separate).
    */
  private val pattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  def preTokenize(text: String): Vector[String] = {
    val m   = pattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** GPT-2 byte↔unicode table: printable bytes map to themselves, the rest
    * shift to 256+n — every byte becomes one printable char so merge rules
    * are plain strings (and merges.txt files stay human-readable).
    */
  val byteAlphabet: Vector[Char] = {
    val direct = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    var n = 0
    Vector.tabulate(256) { b =>
      if (direct(b)) b.toChar
      else { val c = (256 + n).toChar; n += 1; c }
    }
  }
  private val byteToCharArr: Array[Char] = byteAlphabet.toArray
  private val charToByteMap: Map[Char, Byte] =
    byteAlphabet.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  def byteToChar(b: Int): Char = byteToCharArr(b)
  def charToByte(c: Char): Byte = charToByteMap(c)

  /** Byte-alphabet symbol -> the raw string it encodes (e.g. "Ġthe" ->
    * " the") — the representation a SQL oracle operating on raw text needs.
    */
  def symbolToRaw(sym: String): String =
    new String(sym.map(charToByte).toArray, java.nio.charset.StandardCharsets.UTF_8)

  /** Standard merges-file content: one `left right` pair per line, rank =
    * line order; `#`-prefixed header lines skipped — the format of OpenAI's
    * published `vocab.bpe` / HuggingFace `merges.txt`.
    */
  def fromMerges(lines: Iterator[String]): BpeTokenizer =
    new BpeTokenizer(lines
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(a, b) = l.split(" ", 2); (a, b) }
      .toVector)

  def fromMergesFile(path: String): BpeTokenizer = {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    try fromMerges(src.getLines()) finally src.close()
  }

  /** Classic BPE training (count adjacent pairs over the pre-tokenized
    * corpus, repeatedly fuse the most frequent; ties broken lexicographically
    * for determinism). Used for the embedded default vocabulary.
    */
  def train(corpus: String, numMerges: Int): BpeTokenizer = {
    val words = mutable.LinkedHashMap.empty[Vector[String], Int]
    preTokenize(corpus).foreach { pt =>
      val w = pt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .toVector.map(b => byteToChar(b & 0xFF).toString)
      words(w) = words.getOrElse(w, 0) + 1
    }
    val merges = Vector.newBuilder[(String, String)]
    var ws = words.toVector
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Int]
      ws.foreach { case (w, f) =>
        var i = 0
        while (i < w.length - 1) { val p = (w(i), w(i + 1)); counts(p) = counts.getOrElse(p, 0) + f; i += 1 }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toVector.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        ws = ws.map { case (w, f) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == best._1 && w(j + 1) == best._2) { out += (best._1 + best._2); j += 2 }
            else { out += w(j); j += 1 }
          }
          (out.result(), f)
        }
        k += 1
      }
    }
    new BpeTokenizer(merges.result())
  }

  /** Embedded seed text for the default vocabulary — generic English so the
    * learned merges look like a miniature of the published tables (common
    * suffixes, articles, spaces fused to following words).
    */
  private val seedText: String =
    """the quick brown fox jumps over the lazy dog and the dog barks at the fox
      |a model of the system is trained on the data and the data is cleaned
      |the pipeline reads the documents and the documents are tokenized
      |these tokens are counted and the counts are stored in the table
      |this is the standard setting for the training and the evaluation
      |what is the meaning of the word and what are the words in the text
      |there is a time for everything and everything has its time and place
      |in the beginning the state was empty and the state machine started
      |they said that the result of the query is the same as the expected one
      |numbers like 100 and 2024 and 42 appear with punctuation, quotes "here"
      |it's the user's choice and they're sure that we'll see what he'd want
      |international considerations notwithstanding the implementation works
      |""".stripMargin

  /** Default tokenizer: 512 merges trained deterministically from
    * [[seedText]]. Swap in a published table with [[fromMergesFile]].
    */
  lazy val default: BpeTokenizer = train(seedText, 512)
}
