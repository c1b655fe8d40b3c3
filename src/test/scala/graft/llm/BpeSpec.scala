package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer: hand-computed merges, pass semantics, encode
  * round-trip, determinism, and the train→encode consistency law.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePass is left-to-right non-overlapping") {
    assert(Bpe.mergePass(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergePass(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.mergePass(Array("t", "h", "e", "t", "h"), "t", "h").toSeq ==
      Seq("th", "e", "th"))
    assert(Bpe.mergePass(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("trainOnCounts reproduces hand-computed merges with deterministic ties") {
    // corpus: low x10, lower x5, newest x3  (chars: l o w e r s n t)
    // round 1 pairs: (l,o)=15 (o,w)=15 (w,e)=8 (e,r)=5 (n,e)=3 (e,w)=3
    //   (w,s)=0... tie (l,o) vs (o,w) at 15 -> lexicographic: (l,o)
    val wc = Array(("low", 10L), ("lower", 5L), ("newest", 3L))
    val merges = Bpe.trainOnCounts(wc, 3)
    assert(merges(0) == ("l", "o", 15L))
    // after merge 1: lo w | lo w e r | n e w e s t
    // round 2: (lo,w)=15, (w,e)=8, (e,r)=5, (n,e)=3, (e,w)=3, (e,s)=3, (s,t)=3
    assert(merges(1) == ("lo", "w", 15L))
    // after merge 2: low | low e r | n e w e s t
    // round 3: (low,e)=5, (e,r)=5, (n,e)=3, (e,w)=3, (e,s)=3, (s,t)=3
    //   tie 5: (e,r) < (low,e)  lexicographically ("e" < "low")
    assert(merges(2) == ("e", "r", 5L))
  }

  test("non-overlap counting: aab counts (a,b) even inside the aa run") {
    val merges = Bpe.trainOnCounts(Array(("aab", 2L)), 1)
    // pairs: (a,a)=2 (one non-overlapping occurrence x cnt 2),
    //        (a,b)=2 -> tie -> (a,a) wins lexicographically
    assert(merges(0) == ("a", "a", 2L))
    val m2 = Bpe.trainOnCounts(Array(("aabab", 1L)), 1)
    // (a,a)=1, (a,b)=2, (b,a)=1 -> (a,b)
    assert(m2(0) == ("a", "b", 2L))
  }

  test("encodeWord applies merges in rank order, one pass each") {
    val merges = Array(("t", "h"), ("th", "e"))
    assert(Bpe.encodeWord("the", merges).toSeq == Seq("the"))
    assert(Bpe.encodeWord("theater", merges).toSeq ==
      Seq("the", "a", "t", "e", "r"))
    assert(Bpe.encodeWord("thethe", merges).toSeq == Seq("the", "the"))
    // a later merge sees the symbols earlier passes produced
    assert(Bpe.encodeWord("tthe", Array(("t", "h"), ("t", "th"))).toSeq ==
      Seq("tth", "e"))
    // ...but an earlier merge never re-runs after a later one creates
    // its pair (rank-order law): (t,h) ranked FIRST can't consume the
    // h that (c,h)'s merge would have exposed second
    assert(Bpe.encodeWord("tch", Array(("t", "c"), ("t", "h"))).toSeq ==
      Seq("tc", "h"))
  }

  test("encode round-trip: concatenated tokens rebuild the normalized text") {
    val docs = Seq((1L, "The  Fast KEY order"), (2L, "  "), (3L, "scan")).toDF("doc_id", "text")
    val merges = Array(("s", "c"), ("sc", "a"), ("sca", "n"), ("e", "y"))
    val out = Bpe.encodeWithMerges(docs, "doc_id", "text", merges)
      .select(col("doc_id"), concat_ws("", col("tokens")).as("glued"),
        col("n_tokens"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val glued = out.map { case (k, (g, _)) => (k, g) }
    assert(glued(1L) == "thefastkeyorder")
    assert(glued(2L) == "")
    assert(glued(3L) == "scan")
    assert(out(3L)._2 == 1) // fully merged
  }

  test("train -> encode: encoding a training word yields its final train-time symbols") {
    val docs = Seq((1L, "low low low lower lower newest")).toDF("doc_id", "text")
    val mergesDf = Bpe.train(docs, "text", numMerges = 4)
    val ms = mergesDf.orderBy("rank").as[(Int, String, String, Long)]
      .collect().map { case (_, l, r, _) => (l, r) }
    // the train loop applied exactly these passes to "low": encode agrees
    assert(Bpe.encodeWord("low", ms).toSeq == Seq("low"))
    val enc = Bpe.encodeWithMerges(docs, "doc_id", "text", ms)
      .select("n_tokens").head().getInt(0)
    assert(enc > 0)
  }

  test("trainOnCountsFast == trainOnCounts on the hand-computed corpora") {
    val corpora = Seq(
      Array(("low", 10L), ("lower", 5L), ("newest", 3L)),
      Array(("aab", 2L)),
      Array(("aabab", 1L)),
      Array(("aaaa", 3L), ("aa", 7L)),      // same-symbol runs + re-merge
      Array(("x", 5L)),                      // single-char words: no pairs
      Array.empty[(String, Long)])
    for (wc <- corpora; k <- Seq(0, 1, 3, 10)) {
      assert(Bpe.trainOnCountsFast(wc, k).toSeq ==
        Bpe.trainOnCounts(wc, k).toSeq, s"corpus=${wc.toSeq} k=$k")
    }
  }

  test("trainOnCountsFast == trainOnCounts across a seeded random-corpus sweep") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    for (trial <- 1 to 200) {
      val nWords = 1 + rnd.nextInt(12)
      val wc = Array.fill(nWords)(
        ((0 until (1 + rnd.nextInt(10)))
          .map(_ => alphabet(rnd.nextInt(3))).mkString,
          (1 + rnd.nextInt(5)).toLong))
        // the learner contract: distinct words (wordCounts output)
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val k = rnd.nextInt(10)
      assert(Bpe.trainOnCountsFast(wc, k).toSeq ==
        Bpe.trainOnCounts(wc, k).toSeq,
        s"trial=$trial corpus=${wc.toSeq} k=$k")
    }
  }

  test("encodeWordFast equals the pass form on the adversarial re-creation table") {
    // (ab,c) ranked BEFORE (a,b): a naive priority-queue encode would
    // apply rank 0 after rank 1 re-creates its pair (-> [abc]); the
    // pass form cannot revisit an earlier turn (-> [ab, c]). The fast
    // kernel must agree with the pass form, not the priority queue.
    val t = Array(("ab", "c"), ("a", "b"))
    assert(Bpe.encodeWord("abc", t).toSeq == Seq("ab", "c"))
    assert(Bpe.encodeWordFast("abc", new Bpe.MergeIndex(t)).toSeq ==
      Seq("ab", "c"))
    // destroyed-then-recreated pair keeps firing at its turn: (a,b) at
    // rank 2 must still apply after (b,b) consumed and (bb-split never
    // happens) — exercised via a table where rank 1 consumes the b that
    // rank 2 would pair, then rank 0's output re-exposes one
    val t2 = Array(("b", "b"), ("a", "bb"), ("a", "b"))
    assert(Bpe.encodeWordFast("abbb", new Bpe.MergeIndex(t2)).toSeq ==
      Bpe.encodeWord("abbb", t2).toSeq)
    // duplicate pair at two ranks: both entries must be kept
    val t3 = Array(("a", "b"), ("ab", "c"), ("a", "b"))
    assert(Bpe.encodeWordFast("abcab", new Bpe.MergeIndex(t3)).toSeq ==
      Bpe.encodeWord("abcab", t3).toSeq)
  }

  test("encodeWordHf diverges from the pass form exactly on re-creation tables") {
    // the same adversarial table as above: HF min-rank-first re-probes
    // after (a,b) re-creates rank 0's pair, the pass form cannot
    val t = Array(("ab", "c"), ("a", "b"))
    assert(Bpe.encodeWordHf("abc", new Bpe.MergeIndex(t)).toSeq ==
      Seq("abc"))
    assert(Bpe.encodeWord("abc", t).toSeq == Seq("ab", "c"))
    // three-level re-creation chain (the bpe_encode_hf gate's table
    // shape): h+e -> T+he -> Ġ+The, declared in REVERSE rank order
    val g = Array(
      (Bpe.byteSyms(" "), "The"), ("T", "he"), ("t", "he"), ("h", "e"))
    val gi = new Bpe.MergeIndex(g)
    assert(Bpe.encodeWordHf(Bpe.byteSyms(" The"), gi).toSeq ==
      Seq(Bpe.byteSyms(" The")))
    assert(Bpe.encodeWord(Bpe.byteSyms(" The"), g).toSeq ==
      Seq(Bpe.byteSyms(" "), "T", "he"))
    // agreement domain: a trained-order table (outputs built bottom-up,
    // no pair re-creation) — the two semantics coincide
    val a = Array(("a", "b"), ("ab", "c"))
    assert(Bpe.encodeWordHf("abcab", new Bpe.MergeIndex(a)).toSeq ==
      Bpe.encodeWord("abcab", a).toSeq)
  }

  test("encodeWordHf == a naive min-rank restatement across a seeded sweep") {
    // independent slow restatement of the GPT-2 bpe() loop: linear-scan
    // the merge table ascending for the first rank whose pair is
    // adjacent, merge-pass it, repeat
    def naiveHf(word: String, merges: Array[(String, String)]): Seq[String] = {
      var syms = word.map(_.toString).toArray
      var go = true
      while (go && syms.length > 1) {
        val hit = merges.indices.find { k =>
          val (l, r) = merges(k)
          (0 until syms.length - 1).exists(i =>
            syms(i) == l && syms(i + 1) == r)
        }
        hit match {
          case Some(k) =>
            val (l, r) = merges(k)
            syms = Bpe.mergePass(syms, l, r)
          case None => go = false
        }
      }
      syms.toSeq
    }
    val rnd = new scala.util.Random(271)
    val alphabet = "abc"
    def randSym(): String =
      (0 until (1 + rnd.nextInt(2))).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (trial <- 1 to 500) {
      val word = (0 until (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      val merges = Array.fill(rnd.nextInt(10))((randSym(), randSym()))
      val idx = new Bpe.MergeIndex(merges)
      assert(Bpe.encodeWordHf(word, idx).toSeq == naiveHf(word, merges),
        s"trial=$trial word=$word merges=${merges.toSeq}")
    }
  }

  test("encodeWordFast == encodeWord across a seeded random-table sweep") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randSym(): String =
      (0 until (1 + rnd.nextInt(2))).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (trial <- 1 to 500) {
      val word = (0 until (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      val merges = Array.fill(rnd.nextInt(10))((randSym(), randSym()))
      val idx = new Bpe.MergeIndex(merges)
      assert(Bpe.encodeWordFast(word, idx).toSeq ==
        Bpe.encodeWord(word, merges).toSeq,
        s"trial=$trial word=$word merges=${merges.toSeq}")
    }
  }

  test("encodeWithMergesFast matches encodeWithMerges document-for-document") {
    val docs = Seq((1L, "The  Fast KEY order"), (2L, "  "),
      (3L, "scan scan theater"), (4L, null: String)).toDF("doc_id", "text")
    val merges = Array(("s", "c"), ("sc", "a"), ("t", "h"), ("th", "e"))
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("t"),
        col("n_tokens")).orderBy("doc_id").collect().toSeq
    assert(render(Bpe.encodeWithMergesFast(docs, "doc_id", "text", merges)) ==
      render(Bpe.encodeWithMerges(docs, "doc_id", "text", merges)))
  }

  test("vocab: base chars ascending, merge outputs in rank order, duplicates first-wins") {
    val docs = Seq((1L, "cab  CAB"), (2L, "bc")).toDF("doc_id", "text")
    // outputs: ab, abc (via (ab,c)), bc, and a DUPLICATE abc via (a,bc)
    val merges = Array(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc"))
    val v = Bpe.vocab(docs, "text", merges)
      .orderBy("token_id").as[(Int, String)].collect().toSeq
    assert(v == Seq((0, "a"), (1, "b"), (2, "c"),
      (3, "ab"), (4, "abc"), (5, "bc")))
  }

  test("encodeIds maps the fast kernel's tokens; unknown tokens map to -1") {
    val docs = Seq((1L, "cab bc"), (2L, "")).toDF("doc_id", "text")
    val merges = Array(("a", "b"), ("b", "c"))
    val v = Bpe.vocab(docs, "text", merges)
    val out = Bpe.encodeIds(docs, "doc_id", "text", merges, v)
      .orderBy("doc_id")
      .select(col("doc_id"), col("token_ids"), col("n_tokens"))
      .as[(Long, Seq[Int], Int)].collect()
    // vocab: a=0 b=1 c=2 ab=3 bc=4; "cab" -> [c, ab] -> [2, 3]; "bc" -> [4]
    assert(out(0) == ((1L, Seq(2, 3, 4), 3)))
    assert(out(1) == ((2L, Seq.empty[Int], 0)))
    // a vocabulary missing 'c': the c token maps to -1, nothing drops
    val partial = Seq((0, "a"), (1, "b"), (3, "ab"), (4, "bc"))
      .toDF("token_id", "token")
    val out2 = Bpe.encodeIds(docs, "doc_id", "text", merges, partial)
      .orderBy("doc_id").select(col("token_ids")).as[Seq[Int]].head()
    assert(out2 == Seq(-1, 3, 4))
  }

  test("wordCounts matches a manual count and ignores blank docs") {
    val docs = Seq((1L, "a b a"), (2L, ""), (3L, "  b  ")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(wc == Map("a" -> 2L, "b" -> 2L))
  }

  test("encode is invariant under repartitioning (memo is per-partition only)") {
    val docs = (1L to 200L).map(i => (i, s"alpha beta gamma w$i")).toDF("doc_id", "text")
    val merges = Array(("a", "l"), ("al", "p"), ("b", "e"), ("g", "a"))
    val a = Bpe.encodeWithMerges(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_tokens")).orderBy("doc_id").collect().toSeq
    val b = Bpe.encodeWithMerges(docs.repartition(7), "doc_id", "text", merges)
      .select(col("doc_id"), col("n_tokens")).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("vocabBudget drops tail words and reports through CapStats") {
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val cs = new CapStats
    val merges = Bpe.train(docs, "text", numMerges = 1, vocabBudget = 2,
      capStats = Some(cs))
    assert(cs.droppedRows == 1L) // "cc" fell off the budget
    // learned merge comes from the kept words only
    val (l, r) = merges.orderBy("rank").as[(Int, String, String, Long)]
      .collect().map { case (_, a, b, _) => (a, b) }.head
    assert(Set(("a", "a"), ("b", "b")).contains((l, r)))
  }

  test("fertility: exact token/word sums per group, null for word-less") {
    val docs = Seq(
      (1L, "aa bb", "en"),    // with merge (a,a): aa->1 tok, bb->2 -> 3 toks, 2 words
      (2L, "aa aa", "en"),    // 2 toks, 2 words
      (3L, "", "de"),         // word-less group
      (4L, null: String, "de")).toDF("doc_id", "text", "lang")
    val out = Bpe.fertility(docs, "doc_id", "text", "lang",
        Array(("a", "a"))).orderBy("lang").collect()
    val de = out(0); val en = out(1)
    assert((en.getLong(1), en.getLong(2), en.getLong(3)) === ((2L, 4L, 5L)))
    assert(en.getDouble(4) === 5.0 / 4.0)
    assert((de.getLong(1), de.getLong(2), de.getLong(3)) === ((2L, 0L, 0L)))
    assert(de.isNullAt(4))
  }
}
