package graft

import graft.expressions.Blake3
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BLAKE3 kernel against the official published test vectors (the spec's
  * vector set hashes the repeating byte pattern 0,1,…,250,0,1,… at lengths
  * chosen to cross every structural boundary: sub-block, block, chunk,
  * multi-chunk tree with and without partial right edges). */
class Blake3Spec extends AnyFunSuite {

  private def pattern(len: Int): Array[Byte] =
    Array.tabulate(len)(i => (i % 251).toByte)

  private def hex(len: Int): String =
    Blake3.blake3Hex(pattern(len)).toString

  // (input_len, first 32 output bytes) from the official vector set
  private val vectors = Seq(
    0 -> "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262",
    1 -> "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213",
    1023 -> "10108970eeda3eb932baac1428c7a2163b0e924c9a9e25b35bba72b28f70bd11",
    1024 -> "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7",
    1025 -> "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444",
    2048 -> "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a",
    2049 -> "5f4d72f40d7a5f82b15ca2b2e44b1de3c2ef86c426c95c1af0b6879522563030",
    3072 -> "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2",
    3073 -> "7124b49501012f81cc7f11ca069ec9226cecb8a2c850cfe644e327d22d3e1cd3",
    4096 -> "015094013f57a5277b59d8475c0501042c0b642e531b0a1c8f58d2163229e969",
    5120 -> "9cadc15fed8b5d854562b26a9536d9707cadeda9b143978f319ab34230535833")

  vectors.foreach { case (len, expected) =>
    test(s"official vector: input_len=$len") {
      assert(hex(len) == expected)
    }
  }

  test("well-known ascii digests") {
    assert(Blake3.blake3Hex("abc".getBytes("UTF-8")).toString ==
      "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
  }
}

/** Column-level blake3 through the digest dispatch (Spark plan path). */
class Blake3ColumnSpec extends SparkSpec {
  import spark.implicits._

  test("digest(c, 'blake3') hashes utf8 bytes, null-safe, codegen path") {
    val df = Seq(Some(""), Some("abc"), None).toDF("s")
    val out = df.select(
      graft.functions.Functions.digest($"s", "blake3").as("h")).collect()
    assert(out(0).getString(0) ==
      "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert(out(1).getString(0) ==
      "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
    assert(out(2).isNullAt(0))
  }
}
