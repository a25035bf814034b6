package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Curation operators: sampling determinism and rate calibration, PII
  * redaction, repetition stats on crafted documents, int8 quantization
  * error bound. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample is deterministic and tracks the target rates") {
    val df = (0L until 4000L).map(i =>
      (i, if (i % 4 == 0) "en" else "de")).toDF("id", "lang")
    val rates = Map("en" -> 0.25, "de" -> 0.75)
    val once = Curation.stratifiedSample(df, col("lang"), col("id"),
      rates, "s1:").select("id").as[Long].collect().toSet
    val again = Curation.stratifiedSample(df, col("lang"), col("id"),
      rates, "s1:").select("id").as[Long].collect().toSet
    assert(once == again) // bit-for-bit reproducible
    val en = once.count(_ % 4 == 0) / 1000.0
    val de = once.count(_ % 4 != 0) / 3000.0
    assert(math.abs(en - 0.25) < 0.05, s"en rate $en")
    assert(math.abs(de - 0.75) < 0.05, s"de rate $de")
    // a different salt draws a different sample
    val other = Curation.stratifiedSample(df, col("lang"), col("id"),
      rates, "s2:").select("id").as[Long].collect().toSet
    assert(other != once)
    // unlisted strata are dropped entirely
    val dropped = Curation.stratifiedSample(df, col("lang"), col("id"),
      Map("en" -> 1.0), "s1:").select("lang").distinct()
      .as[String].collect().toSeq
    assert(dropped == Seq("en"))
  }

  test("balanceMix hits exact per-group quotas at the largest total") {
    // 600 en, 300 de, 100 fr; targets 0.5/0.3/0.2 -> fr binds:
    // T = 100/0.2 = 500 -> quotas 250/150/100
    val df = (0L until 1000L).map { i =>
      (i, if (i < 600) "en" else if (i < 900) "de" else "fr")
    }.toDF("id", "lang")
    val targets = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)
    val out = Curation.balanceMix(df, "lang", col("id"), targets, "m1:")
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 250L, "de" -> 150L, "fr" -> 100L))
    // deterministic: same salt -> same rows
    val again = Curation.balanceMix(df, "lang", col("id"), targets, "m1:")
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // groups missing from targets are dropped
    val extra = df.union(Seq((5000L, "zz")).toDF("id", "lang"))
    val zz = Curation.balanceMix(extra, "lang", col("id"), targets, "m1:")
      .filter($"lang" === "zz").count()
    assert(zz == 0L)
  }

  test("epochShuffle assigns a seed-keyed permutation of 1..N") {
    val df = (0L until 777L).map(i => Tuple1(i)).toDF("id")
    val out = Curation.epochShuffle(df, col("id"), "e1")
      .select("id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // positions are exactly 1..N (a permutation)
    assert(out.map(_._2).sorted.toSeq == (1L to 777L))
    // deterministic under the same seed
    val again = Curation.epochShuffle(df, col("id"), "e1")
      .select("id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(again.toMap == out.toMap)
    // a different seed produces a different permutation
    val other = Curation.epochShuffle(df, col("id"), "e2")
      .select("id", "shuffle_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(other.toMap != out.toMap)
    // matches the single-window reference rank
    import org.apache.spark.sql.expressions.Window
    val ref = df.withColumn("k",
        md5(concat(lit("e1"), lit(":"), col("id").cast("string"))))
      .withColumn("p", row_number().over(Window.orderBy(col("k"), col("id"))))
      .select("id", "p").collect().map(r => r.getLong(0) -> r.getInt(1).toLong)
    assert(ref.toMap == out.toMap)
  }

  test("split labels every row, tracks weights, and is salt-deterministic") {
    val df = (0L until 4000L).map(Tuple1(_)).toDF("id")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.datasetSplit(df, col("id"), weights, "sp1:")
    val byLabel = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum == 4000L)       // exhaustive labeling
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(math.abs(byLabel("train") / 4000.0 - 0.8) < 0.03)
    assert(math.abs(byLabel("val") / 4000.0 - 0.1) < 0.02)
    // deterministic: identical assignment on re-run; disjoint by construction
    val again = Curation.datasetSplit(df, col("id"), weights, "sp1:")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      == again)
    // unnormalized weights behave like their normalized form
    val scaled = Curation.datasetSplit(df, col("id"),
        weights.map { case (n, w) => (n, w * 7) }, "sp1:")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scaled == again)
  }

  test("unigramLogProb separates typical prose from rare-token noise") {
    val common = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (1L, common),
      (2L, common),
      (3L, common),
      (4L, "zzqj kvxw pblm qrtz wfjn xxyk")   // all-singleton tokens
    ).toDF("doc_id", "text")
    val out = Curation.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // typical docs (shared vocab) score identically (to summation-order
    // ulps) and far above the rare-token doc
    assert(math.abs(out(1L)._1 - out(2L)._1) < 1e-12)
    assert(math.abs(out(2L)._1 - out(3L)._1) < 1e-12)
    assert(out(1L)._1 > out(4L)._1 + 1.0)
    assert(out(1L)._2 == 13L && out(4L)._2 == 6L)
    // hand-check one value: doc 4 tokens each occur once in the corpus;
    // N = 3*13 + 6 = 45, V = 8 + 6 = 14 -> p = (1+1)/(45+14), lp = ln(2/59)
    val expected = math.log(2.0 / 59.0)
    assert(math.abs(out(4L)._1 - expected) < 1e-9)
  }

  test("bigramLogProb penalizes shuffled word order where unigram cannot") {
    val natural = "the cat sat on the mat and the cat sat on the rug"
    // same multiset of tokens, scrambled order -> identical unigram stats
    val shuffled = "mat the on sat cat the rug the on and cat sat the"
    val docs = Seq((1L, natural), (2L, natural), (3L, natural),
      (4L, shuffled)).toDF("doc_id", "text")
    val uni = Curation.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(uni(1L) - uni(4L)) < 1e-9) // unigram is order-blind
    val bi = Curation.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(bi(1L)._1 > bi(4L)._1 + 0.5) // bigram flags the scramble
    assert(bi(1L)._2 == 12L)            // 13 tokens -> 12 bigrams
    // a 1-token doc yields no bigram row
    val one = Curation.bigramLogProb(
      Seq((9L, "single")).toDF("doc_id", "text"), "doc_id", "text")
    assert(one.count() == 0L)
  }

  test("redactPii masks emails, IPs, and phones; counts match") {
    val df = Seq(
      "write bob.smith+x@corp-mail.io from 192.168.0.1 or +44-201-7777",
      "no pii here at all").toDF("t")
    val out = df.select(
      Curation.redactPii(col("t")).as("r"),
      Curation.countMatches(col("t"), Curation.emailPattern).as("e"),
      Curation.countMatches(col("t"), Curation.ipPattern).as("i"),
      Curation.countMatches(col("t"), Curation.phonePattern).as("p"))
      .collect()
    assert(out(0).getString(0) ==
      "write <EMAIL> from <IP> or <PHONE>")
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3))
      == ((1, 1, 1)))
    assert(out(1).getString(0) == "no pii here at all")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3))
      == ((0, 0, 0)))
  }

  test("repetitionStats computes exact counts, top word, and ratios") {
    val df = Seq(
      (1L, "a b a c a b"),      // a:3 b:2 c:1
      (2L, "x x y y"),          // tie at 2 -> lexicographically 'x'
      (3L, "solo")).toDF("id", "text")
    val rows = Curation.repetitionStats(df, col("id"), col("text"))
      .orderBy("doc_id").collect()
    val r1 = rows(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getString(4)) == ((6L, 3L, 3L, "a")))
    assert(r1.getDouble(5) == 3.0 / 6 && r1.getDouble(6) == 3.0 / 6)
    val r2 = rows(1)
    assert((r2.getLong(3), r2.getString(4)) == ((2L, "x")))
    val r3 = rows(2)
    assert((r3.getLong(1), r3.getDouble(5)) == ((1L, 1.0)))
  }

  test("tokenShingles handles short docs; decontaminate counts leaks") {
    val short = Curation.withTokenShingles(
        Seq("a b c").toDF("text"), col("text"), 5, "sh")
      .select("sh").collect()(0).getSeq[String](0)
    assert(short.isEmpty) // < k tokens -> empty, not a descending sequence
    val bench = Seq((100L, "q w e r t y")).toDF("id", "text")
    val train = Seq(
      (1L, "x q w e r t y z"), // contains both bench 5-grams
      (2L, "q w e r x t y"),   // no full 5-gram match
      (3L, "unrelated words entirely here now")).toDF("id", "text")
    val got = Curation.decontaminate(train, bench, "id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // doc 1 leaks 2 distinct shingles
  }

  test("chunkDocuments: coverage, overlap, clamped tail, short docs") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "a b c")).toDF("id", "text")
    val rows = Curation.chunkDocuments(df, "id", col("text"),
        chunkTokens = 5, overlap = 2) // stride 3
      .orderBy("id", "chunk_ix").collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
    // starts 1,4,7 -> [w1..w5], [w4..w8], [w7..w10]
    assert(d1.map(_.getString(3)).toSeq == Seq(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(d1.map(_.getLong(2)).toSeq == Seq(5L, 5L, 4L))
    // consecutive chunks share `overlap` tokens
    assert(d1(0).getString(3).split(" ").takeRight(2).toSeq ==
      d1(1).getString(3).split(" ").take(2).toSeq)
    // short doc -> single clamped chunk
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getString(3)).toSeq == Seq("a b c"))
    assert(d2.head.getLong(2) == 3L)
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(df, "id", col("text"), 5, 5)
    }
  }

  test("bm25Scores ranks exact term matches by relevance") {
    val df = Seq(
      (1L, "spark spark spark is fast"),     // heavy on 'spark'
      (2L, "data and more data in a table"), // two terms, longer
      (3L, "nothing relevant here at all"),
      (4L, "spark")).toDF("id", "text")      // short doc, one hit
    val got = Curation.bm25Scores(df, "id", col("text"),
        Seq("spark", "data", "table"))
      .orderBy(col("score").desc, col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 3 has no query terms -> absent
    assert(!got.map(_._1).contains(3L))
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L))
    // every present doc scores positive; doc 2 matched two distinct terms
    assert(got.forall(_._2 > 0))
    assert(got.find(_._1 == 2L).get._3 == 2L)
    // short doc with one occurrence outranks none; tf saturation keeps
    // doc 1 (3x 'spark') above doc 4 (1x, but shorter)
    val s1 = got.find(_._1 == 1L).get._2
    val s4 = got.find(_._1 == 4L).get._2
    assert(s1 > 0 && s4 > 0)
  }

  test("dequantized int8 dot approximates the exact dot per vector") {
    // raw int dots are NOT comparable across vectors (scales differ);
    // dividing by both scales recovers the true dot within the
    // quantization error bound
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f)),   // query
      (1L, Array(0.9f, 0.1f, 0.4f)),   // exact dot 1.1
      (2L, Array(-0.8f, 0.2f, 0.1f)),  // exact dot -0.75
      (3L, Array(0.5f, 0.5f, 0.5f))).toDF("id", "v") // exact dot 0.75
    val qz = Curation.quantizeInt8(df, col("v"))
      .select(col("id"), col("quantized"), col("scale"))
    val query = qz.filter(col("id") === 0)
      .select(col("quantized").as("qq"), col("scale").as("qs"))
    val dots = qz.filter(col("id") =!= 0).crossJoin(query)
      .withColumn("qdot", aggregate(
        zip_with(col("quantized"), col("qq"),
          (x, y) => (x * y).cast("long")),
        lit(0L), (a, x) => a + x))
      .select(col("id"),
        (col("qdot") / (col("scale") * col("qs"))).as("ad"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val exact = Map(1L -> 1.1, 2L -> -0.75, 3L -> 0.75)
    exact.foreach { case (id, e) =>
      assert(math.abs(dots(id) - e) < 0.02, s"id=$id got ${dots(id)}")
    }
    // dequantized ordering mirrors exact ordering: 1 > 3 > 2
    assert(dots(1L) > dots(3L) && dots(3L) > dots(2L))
  }

  test("quantizeInt8 bounds reconstruction error and handles zeros") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(2.0f))).toDF("id", "v")
    val rows = Curation.quantizeInt8(df, col("v"))
      .select(col("id"), col("scale"), col("quantized"), col("max_err"))
      .orderBy("id").collect()
    // max|x|=1.0 -> scale 127; q = [64, -127, 32] (floor(x*127+0.5))
    assert(rows(0).getSeq[Int](2) == Seq(64, -127, 32))
    // error bound: |q/scale - x| <= 0.5/scale
    assert(rows(0).getDouble(3) <= 0.5 / rows(0).getDouble(1) + 1e-12)
    // all-zero vector: scale 1.0, quantized zeros, zero error
    assert(rows(1).getDouble(1) == 1.0)
    assert(rows(1).getSeq[Int](2) == Seq(0, 0))
    assert(rows(1).getDouble(3) == 0.0)
    // scale shrinks for max|x|>1
    assert(rows(2).getDouble(1) == 63.5)
    assert(rows(2).getSeq[Int](2) == Seq(127))
  }

  test("temperatureMix: quotas follow n^alpha, capped at group size") {
    val df = (1 to 800).map { i =>
      val g = if (i <= 640) "big" else if (i <= 790) "mid" else "tiny"
      (i.toLong, g)
    }.toDF("id", "g")
    val out = graft.operators.Curation.temperatureMix(df, "g", col("id"),
      alpha = 0.5, totalBudget = 200, salt = "t1:")
    val got = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-side recomputation of the quota arithmetic
    val n = Map("big" -> 640L, "mid" -> 150L, "tiny" -> 10L)
    val w = n.view.mapValues(v => math.pow(v.toDouble, 0.5)).toMap
    val wTot = w.values.sum
    val expected = n.map { case (g, ng) =>
      g -> math.min(ng, math.floor(200.0 * w(g) / wTot).toLong)
    }
    assert(got == expected)
    // alpha flattens: tiny's share under alpha=0.5 beats its natural share
    assert(got("tiny").toDouble / got.values.sum > 10.0 / 800.0)
    // deterministic: same rows on a re-run
    val again = graft.operators.Curation.temperatureMix(df, "g", col("id"),
      alpha = 0.5, totalBudget = 200, salt = "t1:")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("weightedSample: exact k, deterministic, equals driver-side A-ES") {
    val df = (1 to 500).map(i => (i.toLong, (i % 19) + 1L)).toDF("id", "w")
    val out = graft.operators.Curation.weightedSample(df, col("id"),
      col("w"), k = 50, salt = "es:")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.size == 50)
    // driver-side replication of the exact key formula
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"es:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expected = (1 to 500).map { i =>
      val u = (bucket(i.toLong) + 0.5) / 4294967296.0
      (math.pow(u, 1.0 / ((i % 19) + 1)), -i.toLong, i.toLong)
    }.sortBy(t => (-t._1, -t._2)).take(50).map(_._3).toSet
    assert(out == expected)
  }

  test("perplexityBuckets: reference-like text heads, gibberish tails") {
    val clean = "the cat sat on the mat and the dog ran to the park"
    val docs = Seq(
      (1L, clean, "en"),                        // in-domain (trains the LM)
      (2L, "the cat ran to the mat", "en"),     // in-domain words
      (3L, "zxqv wqpo mnbv asdf qwer zzzz", "de"), // all OOV -> floor
      (4L, clean + " " + clean, "en")
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.Curation.perplexityBuckets(docs, "doc_id",
        "text", trainFilter = col("lang") === "en", buckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    // gibberish scores strictly lowest and lands in the tail bucket
    assert(out(3L)._1 < out.filterKeys(_ != 3L).values.map(_._1).min)
    assert(out(3L)._2 == 2L)
    // every doc is assigned a bucket in range
    assert(out.values.forall(b => b._2 >= 1L && b._2 <= 2L))
    // buckets are balanced: 4 docs, 2 tiers -> 2 docs each
    assert(out.values.count(_._2 == 1L) == 2)
  }

  test("perplexityBuckets: ids past the 1e6 rank-surrogate headroom fail " +
    "loudly instead of ranking silently wrong") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2000000L, "the dog ran to the park", "en")
    ).toDF("doc_id", "text", "lang")
    val e = intercept[Exception] {
      graft.operators.Curation.perplexityBuckets(docs, "doc_id", "text",
        trainFilter = col("lang") === "en", buckets = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("rank-surrogate")),
      s"unexpected error: $e")
  }

  test("gopherFilters: each rule rejects its crafted violation") {
    val docs = Seq(
      (0L, "the morning light rises slowly across the quiet valley floor " +
           "and it was that nice for everyone watching"),   // clean
      (1L, "tiny doc"),                                     // too short
      (2L, "# # # # # # # # # # the and of it was here now then so ok"),
      (3L, "buy cheap pills buy cheap pills buy cheap pills " +
           "buy cheap pills"),                              // no stopwords
      (4L, "extraordinarily sophisticated implementations demonstrating " +
           "counterproductive hyperspecialization telecommunications " +
           "interdisciplinary characterizations incomprehensibilities " +
           "institutionalization")                          // words too long
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilters(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    def flags(i: Int): Seq[Int] = Seq("g_words", "g_mean_len", "g_alpha",
      "g_symbol", "g_stop").map(c => out(i).getAs[Int](c))
    assert(out(0).getAs[Int]("keep") == 1 && flags(0) == Seq(1, 1, 1, 1, 1))
    assert(out(1).getAs[Int]("g_words") == 0)
    assert(out(2).getAs[Int]("g_symbol") == 0)   // 10 of 21 words are '#'
    assert(out(2).getAs[Int]("g_alpha") == 0)
    assert(out(3).getAs[Int]("g_stop") == 0)
    assert(out(4).getAs[Int]("g_mean_len") == 0)
    assert(out.drop(1).forall(_.getAs[Int]("keep") == 0))
    // signals are exact integer ratios
    assert(out(0).getAs[Int]("n_words") == 18)
    assert(out(0).getAs[Double]("alpha_frac") == 1.0)
    assert(out(0).getAs[Double]("symbol_ratio") == 0.0)
  }

  test("hybrid RRF retrieval: rrf recomputes from the ranks, all three " +
    "membership paths exercised, fusion beats single-list ranks, and the " +
    "plan is window-free (rank via bounded self-join, not WindowExec)") {
    val df = SparkEntry.queries("llm_hybrid_retrieval")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into:\n$plan")
    val out = df.collect()
    assert(out.length == 20)
    def rrf(r: Long): Double = if (r == 0L) 0.0 else 1.0 / (60 + r)
    out.foreach { row =>
      val rl = row.getAs[Long]("rank_lex")
      val rv = row.getAs[Long]("rank_vec")
      assert(rl >= 0 && rl <= 50 && rv >= 0 && rv <= 50)
      assert(rl > 0 || rv > 0, "a fused row must come from some list")
      val expect = BigDecimal(rrf(rl) + rrf(rv))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("rrf") == expect, s"rrf mismatch at $row")
    }
    // all three membership paths present at sf0.001
    assert(out.exists(r => r.getAs[Long]("rank_lex") > 0 &&
      r.getAs[Long]("rank_vec") == 0))
    assert(out.exists(r => r.getAs[Long]("rank_lex") == 0 &&
      r.getAs[Long]("rank_vec") > 0))
    val both = out.filter(r => r.getAs[Long]("rank_lex") > 0 &&
      r.getAs[Long]("rank_vec") > 0)
    assert(both.nonEmpty, "no doc in both candidate lists at sf0.001")
    // the point of RRF: a doc mid-ranked in BOTH lists outranks docs that
    // top a single list — the winner must be a both-lists doc
    val top = out.maxBy(_.getAs[Double]("rrf"))
    assert(top.getAs[Long]("rank_lex") > 0 && top.getAs[Long]("rank_vec") > 0,
      s"fusion winner should come from both lists: $top")
  }

  test("gopherFilters is a pure map-side scan: no exchange, empty-safe") {
    val docs = Seq((0L, "the quick brown fox")).toDF("doc_id", "text")
    val plan = Curation.gopherFilters(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val empty = Curation.gopherFilters(docs.limit(0), col("doc_id"),
      col("text"))
    assert(empty.count() == 0)
    assert(empty.columns.contains("keep"))
  }
}
