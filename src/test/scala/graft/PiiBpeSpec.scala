package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, BpeMerge, BpeWord, PiiScrub}

/** PII scrubbing on planted inputs (the synthetic corpus carries no
  * PII, so the seat is spec-covered here — see PiiScrub's scaladoc)
  * and BPE merge learning against the hand-computable Sennrich
  * fixture plus the real sf0.001 corpus.
  */
class PiiBpeSpec extends SparkSpec {
  import spark.implicits._

  test("PiiScrub.scrub redacts every planted PII class and nothing else") {
    val planted = Seq(
      ("mail me at john.doe+x@mail.example.co today", "mail me at <EMAIL> today"),
      ("ssn 123-45-6789 on file", "ssn <SSN> on file"),
      ("card 4111 1111 1111 1111 or 4111-1111-1111-1111", "card <CC> or <CC>"),
      ("host 10.0.0.1 and 192.168.255.254 up", "host <IP> and <IP> up"),
      ("call (555) 123-4567 or +1 555-123-4567 now", "call <PHONE> or <PHONE> now"),
      // non-PII that a sloppy scrubber eats: plain integers, version
      // strings, order ids, out-of-range octets
      ("order 123456789 v2.1.3 at 999.999.999.999", "order 123456789 v2.1.3 at 999.999.999.999"),
      ("", ""))
    val got = planted.toDF("t", "want")
      .select(PiiScrub.scrub($"t").as("got"), $"want").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("PiiScrub.stats counts each class independently and disjointly") {
    val df = Seq(
      "a@b.co and c@d.org, ssn 123-45-6789, ip 10.0.0.1, tel 555-123-4567"
    ).toDF("t")
    val r = df.select(PiiScrub.stats($"t").as("s"))
      .select($"s.email", $"s.ssn", $"s.credit_card", $"s.ipv4", $"s.phone")
      .head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) == ((2, 1, 0, 1, 1)))
    // an SSN or credit card is NOT double-counted as a phone number
    val cc = Seq("4111 1111 1111 1111 and 123-45-6789").toDF("t")
      .select(PiiScrub.stats($"t").as("s")).select($"s.phone", $"s.credit_card", $"s.ssn").head()
    assert((cc.getInt(0), cc.getInt(1), cc.getInt(2)) == ((0, 1, 1)))
  }

  test("surrogateKey is deterministic, salt-sensitive, join-consistent") {
    val df = Seq("Customer#1", "Customer#2", "Customer#1").toDF("k")
    val s = df.select(PiiScrub.surrogateKey($"k").as("s"),
      PiiScrub.surrogateKey($"k", salt = "x").as("ss")).collect()
    assert(s(0).getString(0) == s(2).getString(0)) // same key → same surrogate
    assert(s(0).getString(0) != s(1).getString(0)) // different key → different
    assert(s(0).getString(0) != s(0).getString(1)) // salt changes the mapping
    assert(s.forall(_.getString(0).length == 12))
  }

  test("Bpe learns the Sennrich-fixture merges in order") {
    // the worked example of the BPE paper: {low:5, lower:2, newest:6, widest:3}
    // pair stats round 0: (e,s)=9 ties (s,t)=9 → lexicographic → (e,s);
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 → (l,o)
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "cnt")
    val merges = Bpe.learnMerges(wc, 3)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
    assert(Bpe.encodeWord("lowest", merges) == Seq("lo", "w", "est"))
    assert(Bpe.encodeWord("low", merges) == Seq("lo", "w"))
    // merge semantics: greedy left-to-right non-overlapping
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    val vocab = Bpe.vocabOf(wc, merges)
    assert(Seq("es", "est", "lo").forall(vocab.contains))
    assert(Seq("l", "o", "w", "e", "r", "n", "s", "t", "i", "d").forall(vocab.contains))
  }

  test("Bpe round-0 pair stats equal q_bpe_pairs; corpus run is deterministic") {
    val docs = Tables.documents(spark, sf)
    val wc = Bpe.wordCounts(docs, "text").localCheckpoint()
    // round 0 top pair == the q_bpe_pairs head (same statistic)
    val top = Bpe.learnMerges(wc, 1).head
    val qTop = queries.DocQueries.qBpePairs(spark, sf).head()
    // round 0 symbols are single chars, so left+right IS the 2-char pair
    assert(top.left + top.right == qTop.getString(0))
    assert(top.pairCount == qTop.getLong(1))
    // a deeper run: merges are distinct, counts non-increasing is NOT
    // required by BPE (merged symbols create new pairs), but
    // determinism across two runs is
    val m1 = Bpe.learnMerges(wc, 8)
    val m2 = Bpe.learnMerges(wc, 8)
    assert(m1 == m2)
    assert(m1.map(m => (m.left, m.right)).distinct.size == 8)
  }

  test("Bpe.learnMergesIncremental equals learnMerges; deltas skip unaffected words") {
    // exact delta algebra on the Sennrich fixture AND a real corpus
    val wcFix = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "cnt")
    assert(Bpe.learnMergesIncremental(wcFix, 5) == Bpe.learnMerges(wcFix, 5))
    val docs = Tables.documents(spark, sf)
    val wc = Bpe.wordCounts(docs, "text").localCheckpoint()
    assert(Bpe.learnMergesIncremental(wc, 8) == Bpe.learnMerges(wc, 8))
    // early-stop parity when every word fuses to one symbol
    val tiny = Seq(("ab", 3L), ("ab", 2L)).toDF("w", "cnt")
    assert(Bpe.learnMergesIncremental(tiny, 10) == Bpe.learnMerges(tiny, 10))
    // the locality that makes it incremental: a word WITHOUT the merged
    // adjacency contributes zero delta rows (per-round shuffle is
    // affected-words-sized, not vocab-sized)
    assert(Bpe.pairDeltas(BpeWord(Seq("x", "y", "z"), 5L), "a", "b").isEmpty)
    assert(Bpe.pairDeltas(BpeWord(Seq("b", "a"), 5L), "a", "b").isEmpty) // reversed ≠ adjacency
    assert(Bpe.pairDeltas(BpeWord(Seq("a", "b", "c"), 2L), "a", "b").toSet ==
      Set(("a", "b", -2L), ("b", "c", -2L), ("ab", "c", 2L)))
  }

  test("Bpe.encodeCorpus round-trips text and matches encodeWord") {
    val docs = Tables.documents(spark, sf).limit(50)
    val wc = Bpe.wordCounts(docs, "text").localCheckpoint()
    val merges = Bpe.learnMerges(wc, 10)
    val enc = Bpe.encodeCorpus(docs, "doc_id", "text", merges)
    val rows = enc.collect()
    assert(rows.length == 50)
    val orig = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val subs = r.getSeq[String](1)
      val toks = orig(id).trim.split("\\s+").toSeq.filter(_.nonEmpty)
      // lossless: concatenating the subwords reconstructs the tokens
      assert(subs.mkString == toks.mkString)
      assert(r.getLong(2) == toks.length.toLong)
      assert(r.getLong(3) == subs.length.toLong)
      // merges compress: never more subwords than characters
      assert(subs.length <= toks.map(_.length).sum)
      // agreement with the single-word reference path on a sample
      assert(toks.take(3).flatMap(w => Bpe.encodeWord(w, merges)) ==
        subs.take(toks.take(3).flatMap(w => Bpe.encodeWord(w, merges)).length))
    }
  }

  test("PiiScrub property: planted PII is always redacted, clean text never touched") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def gen[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    // clean filler: lowercase words (no digits, no @) — nothing a rule
    // can match, so any change to it is a false positive
    val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val filler = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val d = Gen.numChar.map(_.toString)
    def digits(n: Int): Gen[String] = Gen.listOfN(n, Gen.numChar).map(_.mkString)
    val email = for { u <- word; h <- word } yield s"$u@$h.com"
    val ssn = for { a <- digits(3); b <- digits(2); c <- digits(4) } yield s"$a-$b-$c"
    val phone = for { a <- digits(3); b <- digits(3); c <- digits(4);
      sep <- Gen.oneOf(" ", ".", "-") } yield s"$a$sep$b$sep$c"
    val ip = Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))
    val cc = for { gs <- Gen.listOfN(4, digits(4)); sep <- Gen.oneOf(" ", "-") }
      yield gs.mkString(sep)
    val pii = Gen.oneOf(email, ssn, phone, ip, cc)
    val line = for { pre <- filler; p <- pii; post <- filler }
      yield (s"$pre $p $post".trim, s"$pre ".dropWhile(_ == ' ') + "…" + post)
    val cases = gen(Gen.listOfN(300, Gen.zip(filler, line.map(_._1))), 17L)
    val df = cases.toDF("clean", "dirty").select(
      $"clean", $"dirty",
      PiiScrub.scrub($"clean").as("clean_out"),
      PiiScrub.scrub($"dirty").as("dirty_out"))
    val rows = df.collect()
    rows.foreach { r =>
      // clean text is byte-identical through the scrubber
      assert(r.getString(2) == r.getString(0), s"false positive on: '${r.getString(0)}'")
      // the planted PII never survives: no digit runs >= 3 and no '@'
      // remain (every rule's tag is digit- and @-free)
      val out = r.getString(3)
      assert(!out.matches(".*\\d{3,}.*") && !out.contains("@"),
        s"PII survived: '${r.getString(1)}' -> '$out'")
    }
  }

  test("Bpe stops early when every word is fully fused") {
    val wc = Seq(("ab", 3L), ("ab", 1L)).toDF("w", "cnt")
    val merges = Bpe.learnMerges(wc, 10)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("QualityClassifier: weak-label training separates held-out prose from repetition") {
    import graft.text.QualityClassifier
    val rnd = new scala.util.Random(29)
    // distinct vocabularies: the classifier can only learn token
    // WEIGHTS (bag-of-words is blind to repetition when token mass is
    // equal), so the fixture plants the signal real quality filters
    // exploit — junk text draws from a different vocabulary — while
    // the WEAK LABEL still comes from the repetition rule
    val vocab = (1 to 30).map(i => s"w$i")
    val spam = (1 to 10).map(i => s"s$i")
    def goodDoc(): String = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).distinct
      .padTo(6, "filler").mkString(" ")
    def badDoc(): String = { val w = spam(rnd.nextInt(spam.size)); Seq.fill(12)(w).mkString(" ") }
    val docs = (1 to 80).map(i => (i.toLong, if (i % 2 == 0) goodDoc() else badDoc(),
      if (i % 2 == 0) 1.0 else 0.0))
    val df = docs.toDF("id", "text", "truth")
      .withColumn("wl", QualityClassifier.weakLabel($"text"))
    // the weak label reproduces the planted split here (that's the point
    // of the fixture); train on one half, evaluate on the held-out half
    assert(df.filter($"wl" =!= $"truth").count() == 0)
    val train = df.filter($"id" <= 40)
    val heldOut = df.filter($"id" > 40)
    val model = QualityClassifier.train(train, "text", "wl", numFeatures = 1 << 10)
    val scoredOut = QualityClassifier.score(model, heldOut, "text")
    val auc = graft.ml.Evaluator
      .binaryMetrics(scoredOut, "truth", "quality_score", "id", 0.5, 0.5)
      .head().getAs[Double]("roc_auc")
    assert(auc >= 0.9, s"held-out AUC $auc")
    val means = scoredOut.groupBy($"truth").agg(avg($"quality_score").as("m"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(means(1.0) > means(0.0) + 0.2, s"score gap: $means")
  }
}
