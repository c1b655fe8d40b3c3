package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round-15 optimization kernels: every rewrite here replaced a slower
  * expression form and MUST be value-identical to the old form. Each
  * test pins the new implementation against the old expression tree
  * (inlined verbatim as the reference) over adversarial inputs.
  */
class OptKernelsSpec extends SparkSpec {
  import spark.implicits._

  // the pre-round-15 shingle construction, verbatim
  private def oldShingles(text: Column, n: Int): Column = {
    val words = split(Dedup.normalize(text), " ")
    val grams = (2 to n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k), size(words)), (a, b) => concat(a, lit(" "), b))
    }
    when(size(words) < n, array(array_join(words, " ")))
      .otherwise(filter(grams, x => x.isNotNull))
  }

  private val adversarial = Seq(
    null, "", " ", "  ", "\t", "\tfoo", "foo\t", "a", "ab", "a b", "a b c",
    "one two three four five six seven eight nine ten",
    "dup dup dup dup", "a  b\n c", "Mixed CASE Text", "việt ngữ tiếng việt",
    "x" * 500, ("w " * 40).trim, "end with space ", " start", "a b",
    "emoji 😀 astral 𝔘𝔫𝔦 pair", "a.b c.d", "#tag ... more ...")

  test("WordShingles ≡ old zip_with shingles (n = 2, 3, 8)") {
    val df = adversarial.map(Option(_)).toDF("text")
    for (n <- Seq(2, 3, 8)) {
      val r = df.select(
        oldShingles(col("text"), n).as("old"),
        Dedup.shingles(col("text"), n).as("neu"),
        array_distinct(oldShingles(col("text"), n)).as("oldd"),
        Dedup.shinglesDistinct(col("text"), n).as("neud"),
        col("text")).collect()
      r.foreach { row =>
        assert(row.get(0) == row.get(1),
          s"n=$n text=${row.get(4)}: old=${row.get(0)} new=${row.get(1)}")
        assert(row.get(2) == row.get(3),
          s"distinct n=$n text=${row.get(4)}: old=${row.get(2)} new=${row.get(3)}")
      }
    }
  }

  test("WordShingles ≡ old on random strings") {
    val rnd = new scala.util.Random(1234)
    val alpha = "ab .\t\nxyz#…é "
    val strs = (1 to 300).map { _ =>
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val df = strs.toDF("text")
    for (n <- Seq(2, 3)) {
      val bad = df.select(oldShingles(col("text"), n).as("old"),
          Dedup.shingles(col("text"), n).as("neu"))
        .where(not(col("old") <=> col("neu"))).count()
      assert(bad == 0L, s"n=$n: $bad mismatches")
    }
  }

  test("WordDropPositions ≡ old transform/array_except trim") {
    // old surgery, verbatim, over (norm, n_tokens, cov)
    def oldTrim(norm: Column, nTokens: Column, cov: Column): Column =
      when(nTokens === 0, lit("")).otherwise(
        array_join(
          transform(
            array_except(sequence(lit(0), nTokens - 1), coalesce(cov,
              array().cast("array<int>"))),
            p => element_at(split(norm, " "), p + 1)),
          " "))
    def newTrim(norm: Column, nTokens: Column, cov: Column): Column =
      when(nTokens === 0, lit("")).otherwise(
        graft.expressions.WordDropPositions.word_drop_positions(
          norm, coalesce(cov, array().cast("array<int>"))))
    val rows = Seq(
      ("a b c d e", Seq(0, 2)), ("a b c d e", Seq.empty[Int]),
      ("a b c d e", Seq(0, 1, 2, 3, 4)), ("w", Seq(0)), ("w", Seq.empty[Int]),
      (" lead", Seq(0)), (" lead", Seq(1)), ("x y", Seq(1)),
      ("é 😀 b", Seq(1)), ("a a a a", Seq(1, 3)))
    val df = rows.toDF("norm", "cov")
      .withColumn("cov", col("cov").cast("array<int>"))
      .withColumn("n_tokens",
        when(col("norm") === "", 0).otherwise(size(split(col("norm"), " "))))
    val bad = df.select(
        oldTrim(col("norm"), col("n_tokens"), col("cov")).as("old"),
        newTrim(col("norm"), col("n_tokens"), col("cov")).as("neu"))
      .where(not(col("old") <=> col("neu"))).count()
    assert(bad == 0L)
  }

  test("Repetition.bigrams ≡ old slice/transform form") {
    def oldBigrams(text: Column): Column = {
      val ws = split(Dedup.normalize(text), " ")
      transform(slice(ws, lit(1), size(ws) - 1),
        (w, i) => concat(w, lit(" "), element_at(ws, i + 2)))
    }
    val df = adversarial.map(Option(_)).toDF("text")
    val bad = df.select(oldBigrams(col("text")).as("old"),
        Repetition.bigrams(col("text")).as("neu"), col("text"))
      .collect().filterNot(r => r.get(0) == r.get(1))
    assert(bad.isEmpty, bad.map(r =>
      s"text=${r.get(2)}: old=${r.get(0)} new=${r.get(1)}").mkString("; "))
  }

  test("Gopher.profile mean/alpha rewrites ≡ old HOF forms") {
    // old per-metric expressions, verbatim
    val t = col("text")
    val empty = t.isNull || trim(t) === ""
    val words = split(regexp_replace(trim(lower(t)), "\\s+", " "), " ")
    val nw = when(empty, 0).otherwise(size(words)).cast("int")
    val nwD = nw.cast("double")
    val oldMean = when(nw === 0, 0.0).otherwise(round(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / nwD, 6))
    val oldAlphaN = size(filter(words, w => w.rlike("[a-z]")))
    val oldAlpha = when(nw === 0, 0.0)
      .otherwise(round(oldAlphaN.cast("double") / nwD, 6))
    val extra = Seq("1a2a b3", "ab1 cd", "123 456", "a1 1a a1a 1a1",
      "ONLY UPPER", "d#g ...", "..a", "a..", "-", "- x")
    val df = (adversarial ++ extra).map(Option(_)).zipWithIndex
      .toDF("text", "i")
    val prof = Gopher.profile(df, "i", "text")
      .select(col("i"), col("mean_word_len"), col("alpha_frac"))
    val ref = df.select(col("i"), oldMean.as("m"), oldAlpha.as("a"),
      col("text").as("t2"))
    val j = prof.join(ref, Seq("i"))
      .where(not(col("mean_word_len") <=> col("m")) ||
        not(col("alpha_frac") <=> col("a")))
    assert(j.count() == 0L, j.collect().mkString("; "))
  }

  test("Md5U32 ≡ conv(substring(md5(c),1,8),16,10)") {
    val rnd = new scala.util.Random(77)
    val strs = adversarial ++ (1 to 400).map { _ =>
      val len = rnd.nextInt(30)
      (1 to len).map(_ =>
        "aA1 .#é😀\tzZ"(rnd.nextInt(11))).mkString
    }
    val df = strs.map(Option(_)).toDF("v")
    val bad = df.select(
        conv(substring(md5(col("v")), 1, 8), 16, 10).cast("long").as("old"),
        graft.functions.Hashes.u32OfMd5(col("v")).as("neu"))
      .where(not(col("old") <=> col("neu"))).count()
    assert(bad == 0L)
  }

  test("MinhashAffine ≡ k array_min(transform(...)) incl. null array") {
    val P = 2147483647L
    val coefs = Dedup.minhashCoefsPortable(8)
    val rnd = new scala.util.Random(5)
    val rows: Seq[Option[Seq[Long]]] =
      Seq(None, Some(Seq.empty[Long]), Some(Seq(0L)),
        Some(Seq(4294967295L, 0L, 17L))) ++
        (1 to 100).map(_ => Some(Seq.fill(rnd.nextInt(30))(
          rnd.nextLong().abs % 4294967296L)))
    val df = rows.toDF("hs")
    val oldSig = array(coefs.map { case (a, b) =>
      array_min(transform(col("hs"), h => pmod(h * a + b, lit(P))))
    }: _*)
    val bad = df.select(oldSig.as("old"),
        graft.expressions.MinhashAffine.minhash_affine(col("hs"), coefs, P)
          .as("neu"))
      .where(not(col("old") <=> col("neu"))).count()
    assert(bad == 0L)
  }

  test("LogReg adaptive coalesce does not move the fitted weights") {
    // tiny slice → 1 iteration partition; weights must equal a run over
    // a many-partition copy of the same rows
    val feats = (1 to 50).map { i =>
      (i.toLong, i % 2, Seq.tabulate(4)(j => (i * (j + 1) % 7).toDouble / 7))
    }.toDF("id", "y", "vec")
    val w1 = LogReg.train(feats.repartition(16), "y", "vec", iters = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val w2 = LogReg.train(feats.coalesce(1), "y", "vec", iters = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(w1.sameElements(w2))
  }

  test("canonicalDupSpans struct key: negative ids order numerically") {
    // two docs share an 8-token span; the NEGATIVE id is the numeric
    // minimum and must be the kept canonical (the old string key
    // raise_error'd here; numeric struct ordering just works)
    val span = "one two three four five six seven eight"
    val df = Seq((-5L, s"$span tail a"), (3L, s"$span tail b"))
      .toDF("doc_id", "text")
    val spans = Spans.canonicalDupSpans(df, "doc_id", "text",
      spanLen = 8, minOcc = 2L)
    val marked = spans.collect()
    // only the NON-canonical copy (doc 3) is marked redundant
    assert(marked.map(_.getLong(0)).toSet == Set(3L), marked.mkString(";"))
  }

  test("profile join composition stays cheap: gopher keep counts match") {
    // composition smoke: Gopher.profile(keep) over the doc fixture used
    // by gates still produces the same keep count as the rule-by-rule
    // conjunction (guards the staged-projection restructure)
    val docs = Seq(
      "the quick brown fox jumps with many of those words that have been",
      "short", "- a\n- b\n- c", "word " * 60).map(Option(_)).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val p = Gopher.profile(docs, "doc_id", "text", minStopwords = 0)
    val viaRules = p.where(col("ok_words") && col("ok_mean_len") &&
      col("ok_symbol") && col("ok_bullet") && col("ok_ellipsis") &&
      col("ok_alpha") && col("ok_stop")).count()
    assert(p.where(col("keep")).count() == viaRules)
  }
}
