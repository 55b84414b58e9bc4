package graft.functions.expressions

import org.apache.spark.unsafe.Platform

/** Shared arithmetic for the SQL-expressible dedup hash family
  * ([[PolyShingleHashes]], [[PolyMinHashSignature]], [[SimHashPoly]]).
  *
  * Every hash is modular arithmetic below 2⁶³ so the identical formula can be
  * written in DuckDB SQL (the oracle gate) with no overflow-semantics
  * divergence — the same playbook that bought q35 ([[PolyTokenBuckets]]) and
  * q27/q28 (integer-hash hyperplanes) their oracles:
  *
  *  - token hash  `h = (h·31 + codepoint) mod P`, h₀ = 0 — DuckDB:
  *    `list_reduce(list_prepend(0, list_transform(generate_series(1,length(w)),
  *    i -> ascii(substr(w,i,1)))), (acc,x) -> (acc*31+x) % 1000000007)`;
  *  - fold (shingles, band keys) `acc = (acc·R + x) mod P` with R = 1000003:
  *    acc < P ≈ 2³⁰, acc·R < 2⁵⁰ — safe;
  *  - per-function affine rehash `(a_j·h + b_j) mod P` with h < P:
  *    a_j·h < P² ≈ 10¹⁸ < 2⁶³ — safe. a_j/b_j derive from j by fixed integer
  *    formulas (glibc LCG multipliers as arbitrary public constants), so the
  *    oracle SQL needs no literal table.
  *
  * Token hashing walks Unicode CODE POINTS, not raw bytes, to match DuckDB's
  * character-indexed `ascii(substr(w,i,1))` on non-ASCII text too (byte-level
  * hashing agrees only on ASCII corpora).
  */
object PolyHash {
  val P: Long = 1000000007L
  val R: Long = 1000003L

  /** Affine multiplier for hash function j — never ≡ 0 (mod P) for any j ≥ 0
    * below 2³¹ (1103515245 is coprime to P and (j+1)·1103515245+12345 ≡ 0
    * first at j ≈ 9.06e8).
    */
  def a(j: Int): Long = ((j + 1).toLong * 1103515245L + 12345L) % P

  def b(j: Int): Long = ((j + 1).toLong * 69069L + 1L) % P

  /** Polynomial code-point hash of the UTF-8 byte slice [start, end).
    * Malformed UTF-8 (truncated sequence, stray continuation byte, 0xF8+
    * lead) falls back to hashing the single raw byte and advancing one —
    * NEVER reading past `end` (the slice may abut unrelated heap memory in
    * an UnsafeRow) and always deterministic, so reproducible-dedup and
    * oracle-parity guarantees hold on arbitrary binary input too.
    */
  def tokenHash(base: AnyRef, off: Long, start: Int, end: Int): Long = {
    var h = 0L
    var i = start
    while (i < end) {
      val b0 = Platform.getByte(base, off + i) & 0xFF
      val len =
        if (b0 < 0x80) 1
        else if ((b0 & 0xE0) == 0xC0) 2
        else if ((b0 & 0xF0) == 0xE0) 3
        else if ((b0 & 0xF8) == 0xF0) 4
        else 1 // invalid lead byte: treat as a bare byte
      var cp = 0
      if (len == 1) { cp = b0; i += 1 }
      else if (i + len <= end) {
        cp = b0 & (0x7F >> len) // mask: 0x1F / 0x0F / 0x07
        var k = 1
        while (k < len) {
          cp = (cp << 6) | (Platform.getByte(base, off + i + k) & 0x3F)
          k += 1
        }
        i += len
      } else { cp = b0; i += 1 } // truncated sequence at slice end
      h = (h * 31L + cp) % P
    }
    h
  }

  /** Decode a UTF-8 byte array into code points with the same
    * malformed-input fallback as [[tokenHash]] (truncated sequence or stray
    * lead byte → the raw byte, advance one). The output is sized by the
    * WALK's own count, never by `UTF8String.numChars()` — the two disagree
    * on malformed input (numChars advances by the lead byte's implied
    * length even when the sequence is truncated), and sizing by numChars
    * overran kernel buffers (found in review, regression-tested). On
    * malformed input the walk's char indexing may therefore differ from
    * `substr`'s — both deterministic; genuinely binary corpora belong on
    * the byte-level fingerprint paths.
    */
  def codePoints(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length) // ≥ 1 byte per code point
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xFF
      val len =
        if (b0 < 0x80) 1
        else if ((b0 & 0xE0) == 0xC0) 2
        else if ((b0 & 0xF0) == 0xE0) 3
        else if ((b0 & 0xF8) == 0xF0) 4
        else 1
      var cp = 0
      if (len == 1) { cp = b0; i += 1 }
      else if (i + len <= bytes.length) {
        cp = b0 & (0x7F >> len)
        var k = 1
        while (k < len) { cp = (cp << 6) | (bytes(i + k) & 0x3F); k += 1 }
        i += len
      } else { cp = b0; i += 1 }
      out(n) = cp
      n += 1
    }
    if (n == bytes.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Token hashes of a UTF-8 string split on 0x20 (matches `split(text, " ")`
    * with limit -1: empty tokens kept, and a space byte cannot occur inside a
    * multi-byte sequence).
    */
  def tokenHashes(base: AnyRef, off: Long, len: Int): Array[Long] = {
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val th = new Array[Long](spaces + 1)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        th(t) = tokenHash(base, off, start, i)
        t += 1
        start = i + 1
      }
      i += 1
    }
    th
  }
}
