package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the unigram-LM (SentencePiece-family) tokenizer:
  * Viterbi closed forms and tie-breaks, code-point handling, chunked
  * long words, seed counting, hard-EM concentration, and encode/OOV
  * semantics. (The `uni_*` DuckDB-oracle gates verify the distributed
  * chains end-to-end; these pin the kernel semantics the gate fixture
  * can't.)
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def score(m: Map[String, Long]): String => Double = {
    val n = m.values.sum.toDouble
    Unigram.mkScore(m.map { case (k, v) =>
      k -> math.max(v.toDouble / n, Unigram.POov)
    })
  }

  test("viterbi: closed form prefers the high-mass whole piece") {
    // vocab {ab:4, c:2, a:1, b:1}, N=8. "abc":
    //   [ab][c]   = (4/8)(2/8) = 0.125
    //   [a][b][c] = (1/8)(1/8)(2/8) ~ 0.004
    val sc = score(Map("ab" -> 4L, "c" -> 2L, "a" -> 1L, "b" -> 1L))
    assert(Unigram.viterbiSegment("abc", sc, 10).toSeq == Seq("ab", "c"))
  }

  test("viterbi: exact ties break to the smallest backpointer (longest final piece)") {
    // vocab {aa:2, a:2}, N=4: on "aaa" the products [aa][a] and [a][aa]
    // are both 0.25 BITWISE; ascending-j strict > keeps the SMALLEST j
    // at the final position, i.e. the longest final piece: [a][aa]
    val sc = score(Map("aa" -> 2L, "a" -> 2L))
    assert(Unigram.viterbiSegment("aaa", sc, 10).toSeq == Seq("a", "aa"))
  }

  test("viterbi: OOV code points pass through as floor-scored singles") {
    val sc = score(Map("a" -> 1L))
    assert(Unigram.viterbiSegment("axa", sc, 10).toSeq == Seq("a", "x", "a"))
    // an entirely-OOV word still segments (totality): one single per cp
    assert(Unigram.viterbiSegment("zzz", sc, 10).toSeq == Seq("z", "z", "z"))
  }

  test("viterbi: maxPieceLen bounds the lattice") {
    val sc = score(Map("abcd" -> 100L, "ab" -> 1L, "cd" -> 1L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
    // with the whole word admissible it wins outright...
    assert(Unigram.viterbiSegment("abcd", sc, 4).toSeq == Seq("abcd"))
    // ...at maxPieceLen 2 it is not an edge at all
    assert(Unigram.viterbiSegment("abcd", sc, 2).toSeq == Seq("ab", "cd"))
  }

  test("viterbi: segmentation is lossless on arbitrary unicode, incl. non-BMP") {
    val sc = score(Map("ab" -> 3L, "a" -> 1L))
    val rng = new scala.util.Random(42)
    val alphabet = "ab cé世🎉" // é, 世, 🎉 (surrogate pair)
    val cps = alphabet.codePoints().toArray
    (1 to 100).foreach { _ =>
      val n = 1 + rng.nextInt(40) // > MaxDpLen sometimes → chunk path
      val sb = new java.lang.StringBuilder
      (1 to n).foreach(_ => sb.appendCodePoint(cps(rng.nextInt(cps.length))))
      val w = sb.toString.replace(" ", "x") // words carry no spaces
      val pieces = Unigram.viterbiSegment(w, sc, 6)
      assert(pieces.mkString("") == w, s"lossy on $w")
      // no piece splits a surrogate pair
      assert(pieces.forall(p => !Character.isLowSurrogate(p.charAt(0))))
    }
  }

  test("viterbi: long words chunk at MaxDpLen code points and never underflow") {
    val sc = score(Map("aaa" -> 5L, "a" -> 1L))
    val w = "a" * 100 // 4 chunks: 24+24+24+24 then 4
    val pieces = Unigram.viterbiSegment(w, sc, 10)
    assert(pieces.mkString("") == w)
    // chunks of 24 segment as 8×"aaa"; no piece crosses a chunk edge
    assert(pieces.take(8).forall(_ == "aaa"))
    // an all-OOV 100-cp word: products would underflow without chunking
    // ((2^-40)^100 = 2^-4000); chunked, every position segments
    val oov = "q" * 100
    val op = Unigram.viterbiSegment(oov, score(Map("a" -> 1L)), 10)
    assert(op.length == 100 && op.forall(_ == "q"))
  }

  test("seed vocab: substring counts weight by word frequency and in-word multiplicity") {
    val docs = Seq((1L, "ana ana"), (2L, "ana")).toDF("id", "text")
    val seed = Unigram.seedVocab(docs, "text", maxPieceLen = 3, budget = 100)
      .as[(String, Long)].collect().toMap
    // "ana" occurs 3 times; substring "a" twice PER occurrence
    assert(seed("a") == 6L)
    assert(seed("n") == 3L)
    assert(seed("an") == 3L && seed("na") == 3L)
    assert(seed("ana") == 3L)
  }

  test("seed vocab: budget cuts multis by (cnt desc, piece asc); singles always survive") {
    val docs = Seq((1L, "abc abd")).toDF("id", "text")
    val seed = Unigram.seedVocab(docs, "text", maxPieceLen = 3, budget = 2)
      .as[(String, Long)].collect().toMap
    // multis: ab(2), abc/abd/bc/bd/... (1 each) → budget 2 keeps ab + the
    // lexicographically smallest count-1 multi ("abc")
    val multis = seed.keySet.filter(_.length > 1)
    assert(multis == Set("ab", "abc"), multis.toString)
    assert(Set("a", "b", "c", "d").subsetOf(seed.keySet))
  }

  test("hard-EM concentrates mass on whole words; unused multis drop; singles survive at 0") {
    val docs = (1L to 50L).map(i => (i, "hello world")).toDF("id", "text")
    val model = Unigram.trainHard(docs, "text", iters = 1,
      maxPieceLen = 5, budget = 100)
    val m = model.as[(String, Long)].collect().toMap
    // Viterbi under the seed picks the whole word (same count, fewer
    // factors) → all EM mass lands on the two words
    assert(m("hello") == 50L && m("world") == 50L)
    val multis = m.keySet.filter(_.length > 1)
    assert(multis == Set("hello", "world"), multis.toString)
    // singles retained at zero mass (the totality floor)
    assert(m.keySet.filter(_.length == 1) ==
      Set("h", "e", "l", "o", "w", "r", "d"))
    assert(m("h") == 0L)
  }

  test("encode: trained model segments text; OOV and empty docs follow conventions") {
    val train = (1L to 50L).map(i => (i, "hello world")).toDF("id", "text")
    val model = Unigram.trainHard(train, "text", iters = 1,
      maxPieceLen = 5, budget = 100)
    val docs = Seq((1L, "hello world"), (2L, "helloworld"),
      (3L, "hellx"), (4L, "")).toDF("id", "text")
    val out = Unigram.encode(docs, "id", "text", model, maxPieceLen = 5)
      .orderBy("id")
      .select(col("id"), array_join(col("pieces"), "|"), col("n_pieces"))
      .as[(Long, String, Long)].collect()
    assert(out(0) == ((1L, "hello|world", 2L)))
    // concatenated word: both pieces still found (no space needed)
    assert(out(1) == ((2L, "hello|world", 2L)))
    // "hellx": "hell" is not a piece (dropped in EM) → singles, with the
    // OOV "x" floor-scored
    assert(out(2) == ((3L, "h|e|l|l|x", 5L)))
    assert(out(3) == ((4L, "", 0L)))
  }

  test("em step: model pieces with zero count stay usable (floor-clamped) in the next round") {
    // a model whose singles carry count 0 must still score words
    val wc = Seq(("ab", 4L)).toDF("word", "cnt")
    val model = Seq(("ab", 4L), ("a", 0L), ("b", 0L)).toDF("piece", "cnt")
    val next = Unigram.emStepHard(wc, model, maxPieceLen = 2, budget = 10)
      .as[(String, Long)].collect().toMap
    assert(next("ab") == 4L)
    assert(next.get("a").contains(0L) && next.get("b").contains(0L))
  }

  test("soft E-step: closed-form posteriors and per-position conservation") {
    // vocab {ab:2, a:1, b:1}, N=4: p(ab)=0.5, p(a)=p(b)=0.25. On "ab":
    // paths [ab] 0.5 and [a][b] 0.0625, Z = 0.5625 →
    // E[ab] = 0.5/0.5625 = 8/9, E[a] = E[b] = 0.0625/0.5625 = 1/9
    val sc = score(Map("ab" -> 2L, "a" -> 1L, "b" -> 1L))
    val ev = Unigram.fbExpectations("ab", sc, 10).toSeq.toMap
    assert(math.abs(ev("ab") - 8.0 / 9) < 1e-12, ev.toString)
    assert(math.abs(ev("a") - 1.0 / 9) < 1e-12)
    assert(math.abs(ev("b") - 1.0 / 9) < 1e-12)
    // per-position conservation on a fuzzed lattice: every token
    // position is covered by posterior mass exactly 1
    val sc2 = score(Map("ab" -> 3L, "ba" -> 2L, "aba" -> 5L, "a" -> 4L,
      "b" -> 1L))
    val w = "ababab"
    val edges = Unigram.fbExpectations(w, sc2, 3).toSeq
    // conservation: posterior mass × piece length sums to the word
    // length (each position carries total posterior 1)
    val massLen = edges.map { case (p, e) => e * p.length }.sum
    assert(math.abs(massLen - w.length) < 1e-9, massLen.toString)
  }

  test("soft vs hard EM: near-best mass survives soft, is pruned hard") {
    // corpus = "ab" repeated: hard-EM segments every occurrence [ab],
    // so singles recount to 0; soft keeps the [a][b] path's posterior
    val docs = (1L to 20L).map(i => (i, "ab")).toDF("id", "text")
    val wc = Bpe.wordCounts(docs, "text")
    val seed = Unigram.seedVocabFromWordCounts(wc, maxPieceLen = 2,
      budget = 10)
    val hard = Unigram.emStepHard(wc, seed, 2, 10)
      .as[(String, Long)].collect().toMap
    assert(hard("ab") == 20L && hard("a") == 0L && hard("b") == 0L)
    val soft = Unigram.emStepSoft(wc, seed, 2, 10)
      .select(col("piece"), col("weight").cast("double"))
      .as[(String, Double)].collect().toMap
    // seed: ab=20, a=20, b=20, N=60 → p(ab)=1/3, p(a)=p(b)=1/3;
    // paths: [ab] 1/3, [a][b] 1/9 → Z = 4/9; E[ab] = 3/4, E[a]=E[b]=1/4;
    // ×20 occurrences
    assert(math.abs(soft("ab") - 15.0) < 1e-9, soft.toString)
    assert(math.abs(soft("a") - 5.0) < 1e-9)
    assert(math.abs(soft("b") - 5.0) < 1e-9)
  }

  test("vocab ids are mass-ordered; encodeIds maps streams; OOV singles map to -1") {
    val train = (1L to 50L).map(i => (i, "hello world")).toDF("id", "text")
    val model = Unigram.trainHard(train, "text", iters = 1,
      maxPieceLen = 5, budget = 100)
    val vocab = Unigram.vocabIds(model)
    val v = vocab.as[(Int, String)].collect().toMap
    // (cnt desc, piece asc): the two 50-count words first, then the
    // zero-count singles alphabetically
    assert(v(0) == "hello" && v(1) == "world")
    assert((2 to 8).map(v) == Seq("d", "e", "h", "l", "o", "r", "w"))
    val docs = Seq((1L, "hello world"), (2L, "hellx"), (3L, ""))
      .toDF("id", "text")
    val out = Unigram.encodeIds(docs, "id", "text", model, vocab, 5)
      .orderBy("id")
      .select(col("id"), col("piece_ids"), col("n_pieces"))
      .as[(Long, Seq[Int], Long)].collect()
    assert(out(0) == ((1L, Seq(0, 1), 2L)))
    // h|e|l|l|x → ids 4,3,5,5 and the OOV 'x' → -1
    assert(out(1) == ((2L, Seq(4, 3, 5, 5, -1), 5L)))
    assert(out(2) == ((3L, Seq(), 0L)))
  }

  test("fertility: pieces per word by group, null on wordless groups") {
    val train = (1L to 50L).map(i => (i, "hello world")).toDF("id", "text")
    val model = Unigram.trainHard(train, "text", iters = 1,
      maxPieceLen = 5, budget = 100)
    val docs = Seq((1L, "hello world", "en"), (2L, "", "en"),
      (3L, "hellx", "xx"), (4L, "   ", "zz")).toDF("id", "text", "lang")
    val out = Unigram.fertility(docs, "id", "text", "lang", model, 5)
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    // en: 2 docs, 2 words, 2 pieces → 1.0; xx: 1 word → 5 singles → 5.0;
    // zz: wordless → null
    assert(out(0) == (("en", 2L, 2L, 2L, 1.0)))
    assert(out(1) == (("xx", 1L, 1L, 5L, 5.0)))
    assert(out(2)._5.isNaN && out(2)._3 == 0L)
  }

  test("soft-EM loop: weighted scoring closes the loop; encodeW serves the artifact") {
    // corpus "ab" x20: round 1 (from counts) gives ab=15, a=b=5 (see the
    // soft-vs-hard test). Round 2 re-scores under those weights:
    // total=25, p(ab)=3/5, p(a)=p(b)=1/5 → paths [ab] 3/5, [a][b] 1/25
    // → Z=16/25 → E[ab]=15/16, E[a]=E[b]=1/16; ×20 → 18.75 / 1.25
    val docs = (1L to 20L).map(i => (i, "ab")).toDF("id", "text")
    val m2 = Unigram.trainSoft(docs, "text", iters = 2, maxPieceLen = 2,
      budget = 10, seedBudget = 10)
    val w = m2.select(col("piece"), col("weight").cast("double"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(w("ab") - 18.75) < 1e-9, w.toString)
    assert(math.abs(w("a") - 1.25) < 1e-9)
    assert(math.abs(w("b") - 1.25) < 1e-9)
    // soft iterations CONCENTRATE: round-2 posterior on [ab] grew
    // (15/20 = 0.75 → 18.75/20 = 0.9375)
    // encodeW under the weighted artifact picks the dominant piece
    val enc = Unigram.encodeW(docs.limit(1), "id", "text", m2, 2)
      .select(array_join(col("pieces"), "|")).as[String].head()
    assert(enc == "ab")
    // scoresOfWeighted clamps zero-weight singles to the floor
    val sc = Unigram.scoresOfWeighted(m2)
    assert(sc.keySet == Set("ab", "a", "b"))
    assert(sc("a") > 0 && sc("b") > 0)
  }

  test("sp tier: case-preserving ▁ words, exact round-trip, boundary-aware pieces") {
    val docs = Seq(
      (1L, "Hello World hello"),
      (2L, "  spaced   out  "),   // collapses, trims
      (3L, ""),
      (4L, "Hello")).toDF("id", "text")
    val wc = Unigram.wordCountsSp(docs, "text")
      .as[(String, Long)].collect().toMap
    // case preserved and every word carries the marker
    assert(wc("▁Hello") == 2L && wc("▁hello") == 1L && wc("▁World") == 1L)
    val model = Unigram.seedVocabSp(docs, "text", maxPieceLen = 6,
      budget = 100)
    val enc = Unigram.encodeSp(docs, "id", "text", model, 6)
    // round-trip: whitespace-collapsed trimmed text, bitwise
    val rt = Unigram.decodeSp(enc, "id")
      .as[(Long, String)].collect().toMap
    assert(rt(1L) == "Hello World hello")
    assert(rt(2L) == "spaced out")
    assert(rt(3L) == "")
    assert(rt(4L) == "Hello")
    // the marker rides the FIRST piece of each word: every word start
    // is recoverable from the stream alone
    val pieces = enc.filter($"id" === 1L)
      .select("pieces").as[Seq[String]].head()
    assert(pieces.count(_.contains("▁")) == 3, pieces.toString)
    // trained ▁ tier learns whole ▁words as pieces
    val m1 = Unigram.trainHardSp(docs, "text", iters = 1,
      maxPieceLen = 6, budget = 100)
      .as[(String, Long)].collect().toMap
    assert(m1("▁Hello") == 2L)
  }

  test("encode plans narrow: zero Exchange (broadcast scores, per-partition kernel)") {
    val docs = (1L to 100L).map(i => (i, "hello world")).toDF("id", "text")
    val model = Unigram.seedVocab(docs, "text", maxPieceLen = 4, budget = 50)
    val plan = Unigram.encode(docs, "id", "text", model, maxPieceLen = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }

  test("encode is partition-invariant (kernel is per-word, memo is a pure cache)") {
    val docs = (1L to 200L).map(i =>
      (i, s"hello world token$i hello")).toDF("id", "text")
    val model = Unigram.seedVocab(docs, "text", maxPieceLen = 4, budget = 50)
    val a = Unigram.encode(docs.repartition(1), "id", "text", model, 4)
      .select(col("id"), array_join(col("pieces"), "|").as("p"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = Unigram.encode(docs.repartition(13), "id", "text", model, 4)
      .select(col("id"), array_join(col("pieces"), "|").as("p"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  // ---- imported-vocabulary tier -----------------------------------------

  private def importFixture(byteFallback: Boolean): Seq[(String, Double)] =
    Seq("<unk>" -> 0.0, "<s>" -> 0.0, "</s>" -> 0.0) ++
      (if (byteFallback) (0 until 256).map(b => Unigram.bytePiece(b) -> -13.0)
       else Seq.empty) ++
      Seq("▁" -> -3.0, "▁hello" -> -2.0, "he" -> -4.0, "ll" -> -4.5,
        "o" -> -8.0, "h" -> -8.0, "e" -> -8.0, "l" -> -8.0, "w" -> -8.0,
        "r" -> -8.0, "d" -> -8.0, "f" -> -8.0, "i" -> -8.0, "n" -> -8.0)

  test("renderVocab / parseVocab round-trip the (piece, log_prob) rows in order") {
    val rows = importFixture(byteFallback = true)
    assert(Unigram.parseVocab(Unigram.renderVocab(rows)).toSeq == rows)
    // tabs/newlines in a piece are unrepresentable — loud, not lossy
    intercept[IllegalArgumentException] {
      Unigram.renderVocab(Seq("a\tb" -> -1.0))
    }
  }

  test("loadVocab assigns ids by line order (the SentencePiece id contract)") {
    val tmp = java.nio.file.Files.createTempDirectory("uni_vocab_spec")
    try {
      val p = tmp.resolve("f.vocab")
      java.nio.file.Files.writeString(p,
        Unigram.renderVocab(importFixture(byteFallback = true)))
      val v = Unigram.loadVocab(spark, p.toString)
        .orderBy("piece_id")
        .select("piece_id", "piece").as[(Int, String)].collect()
      assert(v(0) == ((0, "<unk>")))
      assert(v(3) == ((3, "<0x00>")))
      assert(v(258) == ((258, "<0xFF>")))
      assert(v(259) == ((259, "▁")))
    } finally graft.storage.TableStore.deleteRecursively(tmp)
  }

  test("encodeImported: log-space viterbi, ▁ convention, line-order ids") {
    import spark.implicits._
    val vocab = spark.createDataset(
      importFixture(byteFallback = true).zipWithIndex.map {
        case ((p, lp), i) => (i, p, lp)
      }).toDF("piece_id", "piece", "log_prob")
    val docs = Seq((1L, "hello world")).toDF("id", "text")
    val enc = Unigram.encodeImported(docs, "id", "text", vocab)
    val (pieces, ids) = enc.select($"pieces", $"piece_ids")
      .as[(Seq[String], Seq[Int])].head()
    // "▁hello" is a whole vocab piece; "▁world" segments as singles
    assert(pieces.head == "▁hello", pieces.toString)
    assert(pieces.contains("▁") && pieces.contains("w"), pieces.toString)
    // every id is the piece's line index — none are -1 or unk
    val idOf = importFixture(byteFallback = true).map(_._1).zipWithIndex.toMap
    assert(ids == pieces.map(idOf(_)), ids.toString)
  }

  test("byte-fallback: OOV code points expand to <0xXX> pieces and round-trip") {
    import spark.implicits._
    val vocab = spark.createDataset(
      importFixture(byteFallback = true).zipWithIndex.map {
        case ((p, lp), i) => (i, p, lp)
      }).toDF("piece_id", "piece", "log_prob")
    // é (2-byte), 世 (3-byte), 🚀 (4-byte astral) are all OOV
    val docs = Seq((1L, "hello é世🚀"), (2L, "")).toDF("id", "text")
    val enc = Unigram.encodeImported(docs, "id", "text", vocab)
    val pieces = enc.filter($"id" === 1L).select($"pieces")
      .as[Seq[String]].head()
    assert(pieces.count(_.startsWith("<0x")) == 2 + 3 + 4, pieces.toString)
    val ids = enc.filter($"id" === 1L).select($"piece_ids")
      .as[Seq[Int]].head()
    assert(!ids.contains(-1) && !ids.contains(0), ids.toString)
    val rt = Unigram.decodeImported(enc, "id")
      .orderBy("id").select("text_rt").as[String].collect().toSeq
    assert(rt == Seq("hello é世🚀", ""))
  }

  test("no byte tier: OOV keeps its surface at <unk>'s id") {
    import spark.implicits._
    val vocab = spark.createDataset(
      importFixture(byteFallback = false).zipWithIndex.map {
        case ((p, lp), i) => (i, p, lp)
      }).toDF("piece_id", "piece", "log_prob")
    val docs = Seq((1L, "hello é")).toDF("id", "text")
    val (pieces, ids) = Unigram.encodeImported(docs, "id", "text", vocab)
      .select($"pieces", $"piece_ids").as[(Seq[String], Seq[Int])].head()
    assert(pieces.last == "é", pieces.toString)
    assert(ids.last == 0, ids.toString) // <unk> is line 0
  }

  test("nfkc regime: compatibility forms fold before segmentation") {
    import spark.implicits._
    val vocab = spark.createDataset(
      importFixture(byteFallback = true).zipWithIndex.map {
        case ((p, lp), i) => (i, p, lp)
      }).toDF("piece_id", "piece", "log_prob")
    // ﬁ → fi (ligature), nbsp → space (a WORD BOUNDARY after folding)
    val docs = Seq((1L, "ﬁn hello world")).toDF("id", "text")
    val pieces = Unigram.encodeImported(docs, "id", "text", vocab,
        nfkc = true)
      .select($"pieces").as[Seq[String]].head()
    // "ﬁn" folds to "fin": no byte-fallback pieces anywhere, and the
    // nbsp split means "world" carries its own ▁ marker
    assert(!pieces.exists(_.startsWith("<0x")), pieces.toString)
    assert(pieces.count(_ == "▁") >= 1 && pieces.contains("▁hello"),
      pieces.toString)
    // without the flag the ligature byte-falls-back and nbsp is NOT a
    // word boundary
    val raw = Unigram.encodeImported(docs, "id", "text", vocab)
      .select($"pieces").as[Seq[String]].head()
    assert(raw.exists(_.startsWith("<0x")), raw.toString)
  }

  test("the uni_encode_nfkc gate's pinned raw→expected rows match java NFKC") {
    graft.gates.TrainGates.UniNfkcPlanted.foreach { case (id, raw, exp) =>
      assert(java.text.Normalizer.normalize(raw,
        java.text.Normalizer.Form.NFKC) == exp, s"row $id")
    }
  }

  test("export → import closes the loop: trained model serves through encodeImported") {
    import spark.implicits._
    // distinct word frequencies → no near-ties, so the product-space
    // and log-space argmax paths coincide on this fixture
    val docs = Seq((1L, "hello world hello"), (2L, "hello there world"),
      (3L, "hello world world there")).toDF("id", "text")
    val m = Unigram.trainHardSp(docs, "text", iters = 1,
      maxPieceLen = 6, budget = 64)
    val tmp = java.nio.file.Files.createTempDirectory("uni_export_spec")
    try {
      val f = tmp.resolve("trained.vocab")
      java.nio.file.Files.writeString(f,
        Unigram.renderVocab(Unigram.exportVocab(m)))
      val vocab = Unigram.loadVocab(spark, f.toString)
      // specials + byte tier lead, trained pieces follow in mass order
      val head = vocab.orderBy("piece_id").select("piece")
        .as[String].take(4).toSeq
      assert(head.take(3) == Seq("<unk>", "<s>", "</s>") &&
        head(3) == "<0x00>", head.toString)
      val imp = Unigram.encodeImported(docs, "id", "text", vocab)
      val sp = Unigram.encodeSp(docs, "id", "text", m, 6)
      val a = imp.orderBy("id").select(array_join(col("pieces"), "|"))
        .as[String].collect().toSeq
      val b = sp.orderBy("id").select(array_join(col("pieces"), "|"))
        .as[String].collect().toSeq
      assert(a == b, s"imported $a != self-trained $b")
      // and no byte fallback fired (every char is in the trained model)
      assert(!a.exists(_.contains("<0x")), a.toString)
    } finally graft.storage.TableStore.deleteRecursively(tmp)
  }

  test("fallbackStats: coverage audit separates in-lattice and fallback slices") {
    import spark.implicits._
    val vocab = spark.createDataset(
      importFixture(byteFallback = true).zipWithIndex.map {
        case ((p, lp), i) => (i, p, lp)
      }).toDF("piece_id", "piece", "log_prob")
    val docs = Seq(
      (1L, "hello world", "en"),
      (2L, "hello hello", "en"),
      (3L, "é世", "xx"), // ▁ in-lattice + 2+3 byte pieces → frac 5/6
      (4L, "", "empty")).toDF("id", "text", "lang")
    val out = Unigram.fallbackStats(docs, "id", "text", "lang", vocab)
      .orderBy("lang")
      .select("lang", "n_pieces", "n_fallback", "fallback_frac").collect()
    val byLang = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(byLang("en")._2 == 0L && byLang("en")._3 == 0.0, byLang.toString)
    assert(byLang("xx") == ((6L, 5L, 5.0 / 6.0)), byLang.toString)
    // piece-less group: 0 pieces, null frac (surfaced as -1 above)
    assert(byLang("empty") == ((0L, 0L, -1.0)), byLang.toString)
  }

  test("encodeImported plans narrow: zero Exchange") {
    import spark.implicits._
    val vocab = spark.createDataset(
      importFixture(byteFallback = true).zipWithIndex.map {
        case ((p, lp), i) => (i, p, lp)
      }).toDF("piece_id", "piece", "log_prob")
    val docs = (1L to 50L).map(i => (i, "hello world")).toDF("id", "text")
    val plan = Unigram.encodeImported(docs, "id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
