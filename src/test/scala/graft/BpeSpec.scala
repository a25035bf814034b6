package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** BPE trainer/encoder against the hand-computed classic example
  * (Sennrich et al.'s low/lower/newest/widest corpus), the
  * max-frequency-is-non-increasing invariant, early stopping, and the
  * concatenation round-trip of the encoder. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // 5x low, 2x lower, 6x newest, 3x widest — one word per doc row
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("reproduces the hand-computed classic merge sequence") {
    val merges = Curation.bpeTrain(corpus, "text", numMerges = 4)
      .orderBy($"step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair freqs: e-s 9 and s-t 9 tie -> lexicographic picks (e,s); after
    // (e,s)(es,t), l-o and o-w tie at 7 -> (l,o) then (lo,w)
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("best-pair frequency never increases across steps") {
    val freqs = Curation.bpeTrain(corpus, "text", numMerges = 10)
      .orderBy($"step").collect().map(_.getLong(3))
    assert(freqs.nonEmpty && freqs.sliding(2).forall {
      case Array(a, b) => a >= b
      case _           => true
    })
  }

  test("stops early when the best pair drops below minPairFreq") {
    val merges = Curation.bpeTrain(corpus, "text", numMerges = 50,
      minPairFreq = 8L)
    assert(merges.count() == 2) // only (e,s) and (es,t) reach freq >= 8
  }

  test("encoder applies merges in order; subtokens concatenate to words") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val docs = Seq((1L, "lowest newest"), (2L, "low wider"))
      .toDF("doc_id", "text")
    val out = Curation.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("low", "est", "n", "e", "w", "est"))
    assert(out(2L) == Seq("low", "w", "i", "d", "e", "r"))
    // concatenation invariant: tokens re-join to the original words
    assert(out(1L).mkString == "lowestnewest")
  }
}
