package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "der schnelle braune fuchs und der faule hund"),
    (3L, "a b c"),
    (4L, "x"),
  ).toDF("id", "text")

  test("tokenCount splits on single space") {
    val r = df.select($"id", tokenCount($"text").as("n")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r(1) === 9); assert(r(3) === 3); assert(r(4) === 1)
  }

  test("tokenHits counts exact tokens") {
    assert(df.filter($"id" === 1).select(tokenHits($"text", "the")).head.getInt(0) === 2)
    assert(df.filter($"id" === 1).select(tokenHits($"text", "cat")).head.getInt(0) === 0)
  }

  test("langId picks marker-majority language with deterministic ties") {
    val r = df.select($"id", langId($"text").as("l")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1) === "en") // 'the' x2
    assert(r(2) === "de") // 'der' x2, 'und'
    assert(r(3) === "und") // no markers
    assert(r(4) === "und") // no markers at all
  }

  test("shingles: count, distinctness, content") {
    val r = df.filter($"id" === 3).select(shingles($"text", 2)).head.getSeq[String](0)
    assert(r === Seq("a b", "b c"))
    val empty = df.filter($"id" === 4).select(shingles($"text", 3)).head.getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("jaccard: identical=1, disjoint=0") {
    val d = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d"))).toDF("x", "y", "z")
    assert(d.select(jaccard($"x", $"y")).head.getDouble(0) === 1.0)
    assert(d.select(jaccard($"x", $"z")).head.getDouble(0) === 0.0)
  }

  test("rollingHash and fingerprint are deterministic and discriminative") {
    val twice = df.select(rollingHash($"text").as("h")).collect().map(_.getLong(0))
    val again = df.select(rollingHash($"text").as("h")).collect().map(_.getLong(0))
    assert(twice.toSeq === again.toSeq)
    assert(twice.distinct.length === twice.length) // 4 distinct texts -> 4 hashes
    twice.foreach(h => assert(h >= 0 && h < 1000000007L))
  }

  test("simhash64: equal texts equal hashes, hamming 0; different texts differ") {
    val d = Seq(("a b c d e f", "a b c d e f"), ("a b c d e f", "q w e r t y")).toDF("x", "y")
    val r = d.select(hamming64(simhash64($"x"), simhash64($"y")).as("h")).collect().map(_.getInt(0))
    assert(r(0) === 0)
    assert(r(1) > 0)
  }

  // the fused kernels claim bit-identity with the HOF column trees they
  // replaced — assert it on fixture docs plus adversarial edges (empty
  // string, consecutive/leading/trailing spaces, multi-byte UTF-8)
  private lazy val kernelProbe = {
    val edges = Seq((9001L, ""), (9002L, "  a  b "), (9003L, "héllo wörld héllo"),
      (9004L, "一 二 三 一"), (9005L, "x")).toDF("doc_id", "text")
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").limit(100).union(edges)
  }

  test("fused simhash64 is bit-identical to the HOF formulation") {
    val bad = kernelProbe
      .filter(not(simhash64($"text") <=> simhash64Hof($"text"))).count()
    assert(bad === 0)
  }

  test("fused shingleHashes is bit-identical to the HOF formulation") {
    val th  = transform(tokens($"text"), t => xxhash64(t))
    val cnt = size(th) - 2
    val hof = when(cnt >= 1,
        sort_array(array_distinct(transform(sequence(lit(1), cnt),
          i => xxhash64(element_at(th, i), element_at(th, i + 1), element_at(th, i + 2))))))
      .otherwise(array().cast("array<long>"))
    val bad = kernelProbe
      .filter(not(shingleHashesFused($"text", 3) <=> hof)).count()
    assert(bad === 0)
  }

  test("subwordCount: at least one per token, more for long words") {
    val d = Seq(("ab cd", "internationalization hi")).toDF("x", "y")
    assert(d.select(subwordCount($"x")).head.getInt(0) === 2)
    assert(d.select(subwordCount($"y")).head.getInt(0) === 6) // ceil(20/4)=5 + 1
  }
}
