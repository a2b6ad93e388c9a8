package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.sources.Tables

/** BPE tokenizer train + encode (E5): merge-rule learning on a
  * word-frequency table, ranked greedy segmentation, losslessness, and
  * partition-invariance of the distributed training path.
  */
class BpeSpec extends SparkSpec {

  test("train: hand-computed merges on a two-word vocab") {
    // ab x3, ac x1 -> pairs (a,b)=3, (b,</w>)=3, (a,c)=1, (c,</w>)=1.
    // count tie at 3 resolves lexicographically: (a,b) before (b,</w>).
    // after merging: (ab,</w>)=3 wins round 2; every remaining pair has
    // count 1, so training stops (paper rule: never merge count-1 pairs).
    val merges = Bpe.train(Map("ab" -> 3L, "ac" -> 1L), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
  }

  test("train: leftmost-first merging — 'aaa' under (a,a) becomes [aa, a]") {
    // aaab x2: pairs (a,a)=4 (two per occurrence), (a,b)=2, (b,</w>)=2.
    // merge (a,a): symbols become [aa, a, b, </w>] — NOT [a, aa, ...] —
    // then (aa,a)=2 ties (a,b)=2 and (b,</w>)=2; (a,b) is lexicographic min.
    val merges = Bpe.train(Map("aaab" -> 2L), numMerges = 2)
    assert(merges.head == (("a", "a")))
    assert(merges(1) == (("a", "b")))
  }

  test("train: stops early when no pair reaches count 2") {
    assert(Bpe.train(Map("abc" -> 1L), numMerges = 5).isEmpty)
    assert(Bpe.train(Map.empty, numMerges = 5).isEmpty)
    assert(Bpe.train(Map("ab" -> 9L), numMerges = 0).isEmpty)
  }

  test("encode: applies merges by RANK (not text order) and leftmost-first") {
    // ranks: (e,s) then (es,t) then (t,</w>) — "newest" must segment as
    // n e w est </w> via the rank path, not greedily longest-first
    val ranks = Bpe.ranksOf(Seq(("e", "s"), ("es", "t"), ("t", Bpe.EndOfWord)))
    assert(Bpe.encodeWord("newest", ranks) ==
      Seq("n", "e", "w", "est", Bpe.EndOfWord))
    // a word without any learnable pair stays characters + sentinel
    assert(Bpe.encodeWord("xy", ranks) == Seq("x", "y", Bpe.EndOfWord))
    // unseen characters (OOV) degrade to single-char pieces, never fail
    assert(Bpe.encodeWord("née", ranks) == Seq("n", "é", "e", Bpe.EndOfWord))
  }

  test("encode: training's own vocabulary round-trips through its merges") {
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(wc, numMerges = 10)
    assert(merges.nonEmpty)
    val ranks = Bpe.ranksOf(merges)
    wc.keys.foreach { w =>
      val pieces = Bpe.encodeWord(w, ranks)
      assert(pieces.mkString.stripSuffix(Bpe.EndOfWord) == w,
        s"lossless round-trip failed for $w: $pieces")
    }
    // the most frequent word must compress below its character count
    assert(Bpe.encodeWord("newest", ranks).length < "newest".length + 1)
  }

  test("encode: lossless for arbitrary words under arbitrary trained merges") {
    // seeded property sweep: random low-alphabet corpora (so pairs repeat
    // and merges actually fire), random merge budgets — concatenating the
    // pieces must always reproduce the word
    val rnd = new scala.util.Random(42)
    (1 to 60).foreach { _ =>
      val ws = Vector.fill(1 + rnd.nextInt(20))(
        Vector.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString)
      val wc = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val ranks = Bpe.ranksOf(Bpe.train(wc, rnd.nextInt(13)))
      ws.foreach { w =>
        assert(Bpe.encodeWord(w, ranks).mkString.stripSuffix(Bpe.EndOfWord) == w)
      }
    }
  }

  test("train: incremental pair counts equal a brute-force recount on random corpora") {
    // reference implementation: recount every pair from scratch per merge
    // (the pre-optimization algorithm) — the incremental trainer must
    // produce bit-identical merge sequences on arbitrary inputs
    def bruteTrain(wc: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
      var vocab = wc.toVector.sortBy(_._1)
        .map { case (w, n) => (w.map(_.toString).toVector :+ Bpe.EndOfWord, n) }
      val out = Vector.newBuilder[(String, String)]
      var done = false
      var i = 0
      while (i < numMerges && !done) {
        val counts = collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
        }
        val cand = counts.filter(_._2 >= 2L)
        if (cand.isEmpty) done = true
        else {
          val pair = cand.minBy { case ((a, b), n) => (-n, a, b) }._1
          out += pair
          // leftmost-first merge, identical to Bpe.mergeOnce
          vocab = vocab.map { case (syms, n) =>
            val b = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
                b += syms(j) + syms(j + 1); j += 2
              } else { b += syms(j); j += 1 }
            }
            (b.result(), n)
          }
          i += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(23)
    (1 to 100).foreach { _ =>
      val wc = Vector.fill(1 + rnd.nextInt(30))(
        Vector.fill(1 + rnd.nextInt(9))(('a' + rnd.nextInt(3)).toChar).mkString)
        .groupBy(identity).map { case (w, g) => w -> (g.size.toLong + rnd.nextInt(4)) }
      val nm = rnd.nextInt(15)
      assert(Bpe.train(wc, nm) == bruteTrain(wc, nm), s"diverged on $wc nm=$nm")
    }
  }

  test("train: incremental pair maintenance handles fluent-default scale (informational)") {
    // ~50k synthetic words x 1000 merges — the bpeMerges() defaults'
    // order of magnitude; the full-recount form took tens of seconds here
    val rnd = new scala.util.Random(11)
    val wc = (1 to 50000).map { _ =>
      Vector.fill(3 + rnd.nextInt(8))(('a' + rnd.nextInt(12)).toChar).mkString
    }.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val t0 = System.nanoTime()
    val merges = Bpe.train(wc, numMerges = 1000)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"50k words x ${merges.size} merges in $sec%.2f s")
    assert(merges.nonEmpty)
    assert(sec < 30.0, f"driver merge loop too slow: $sec%.1f s")
  }

  test("trainOn: partition-invariant and deterministic on the documents corpus") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.plans.NativeColumns.tokenize(col("text"))).as("token"))
    val a = Bpe.trainOn(toks.repartition(1), "token", numMerges = 24, maxVocab = 512)
    val b = Bpe.trainOn(toks.repartition(13), "token", numMerges = 24, maxVocab = 512)
    assert(a == b)
    assert(a.size == 24)
  }

  test("saveMerges/loadMerges: the tokenizer artifact round-trips in rank order") {
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(wc, numMerges = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.saveMerges(spark, merges, dir)
    assert(Bpe.loadMerges(spark, dir) == merges)
    // a retrain overwrite replaces, not appends
    Bpe.saveMerges(spark, merges.take(2), dir)
    assert(Bpe.loadMerges(spark, dir) == merges.take(2))
  }

  test("unicode: surrogate pairs and combining marks survive encode losslessly") {
    // word.map(_.toString) splits astral chars into lone surrogates; the
    // contract is LOSSLESSNESS (concatenation restores the word), not
    // codepoint-aligned pieces — pin that explicitly for emoji (surrogate
    // pair), CJK, and combining diacritics
    val words = Seq("café", "éclair", "日本語", "a😀b")
    val wc = words.map(_ -> 3L).toMap
    val ranks = Bpe.ranksOf(Bpe.train(wc, numMerges = 20))
    words.foreach { w =>
      val pieces = Bpe.encodeWord(w, ranks)
      assert(pieces.mkString.stripSuffix(Bpe.EndOfWord) == w,
        s"unicode round-trip failed for $w")
    }
    // and through the DataFrame encode path
    import SharedSpark.spark.implicits._
    val out = Bpe.withPieces(Seq((1L, words)).toDF("id", "toks"), "toks",
      Bpe.train(wc, 20), "p")
    val joined = out.select("p").as[Seq[String]].head().mkString
    assert(joined == words.map(_ + Bpe.EndOfWord).mkString)

    // r10: symbols are CODE POINTS, never lone surrogates — the cases the
    // fully-merged training above cannot catch:
    //  (a) an OOV astral word crosses the DataFrame boundary in pieces
    //      (a lone surrogate there corrupts to '?' in UTF8String)
    val oov = Bpe.withPieces(Seq((1L, Seq("x😀y"))).toDF("id", "toks"), "toks",
      Bpe.train(wc, 20), "p")
      .select("p").as[Seq[String]].head()
    assert(oov.mkString.stripSuffix(Bpe.EndOfWord) == "x😀y",
      s"OOV astral word corrupted through the frame boundary: $oov")
    assert(oov.forall(p => !p.exists(c => Character.isSurrogate(c) && p.length == 1)),
      s"lone surrogate escaped into pieces: $oov")
    //  (b) merge rules containing astral symbols survive save/load (a
    //      lone-surrogate rule would reload as '?' and never match again)
    val emojiWc = Map("a😀" -> 5L, "b😀" -> 4L)
    val emojiMerges = Bpe.train(emojiWc, 10)
    assert(emojiMerges.exists { case (l, r) => (l + r).contains("😀") },
      s"training should learn an astral-bearing rule: $emojiMerges")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-astral").toString
    Bpe.saveMerges(spark, emojiMerges, dir)
    val reloaded = Bpe.loadMerges(spark, dir)
    assert(reloaded == emojiMerges,
      s"astral merge rules corrupted through parquet: $reloaded vs $emojiMerges")
    assert(Bpe.encodeWord("a😀", Bpe.ranksOf(reloaded)) ==
      Bpe.encodeWord("a😀", Bpe.ranksOf(emojiMerges)),
      "reloaded rules must segment identically")
  }

  test("encode: degenerate-blob guard — a kilochar unbroken token bypasses the O(len^2) loop losslessly") {
    val ranks = Bpe.ranksOf(Seq(("a", "a"), ("aa", "aa")))
    // a 100k-char blob would be ~10^10 rank lookups without the guard;
    // with it the encode is instant and emits single-char pieces + sentinel
    val blob = "a" * 100000
    val t0 = System.nanoTime()
    val pieces = Bpe.encodeWord(blob, ranks)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, f"guard failed to bound the loop: $ms%.0f ms")
    assert(pieces.length == blob.length + 1 && pieces.last == Bpe.EndOfWord)
    assert(pieces.dropRight(1).mkString == blob, "guard must stay lossless")
    // words at/under the cap still merge normally
    val short = Bpe.encodeWord("aaaa", ranks)
    assert(short == Seq("aaaa", Bpe.EndOfWord))
    // the cap is a parameter: a tiny cap forces the bypass on short words too
    assert(Bpe.encodeWord("aaaa", ranks, maxChars = 3) ==
      Seq("a", "a", "a", "a", Bpe.EndOfWord))
  }

  test("withPieces: zero-shuffle map-side plan; null tokens stay null") {
    import SharedSpark.spark.implicits._
    val merges = Seq(("a", "b"), ("ab", Bpe.EndOfWord))
    val df = Seq((1L, Seq("ab", "cd")), (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "toks")
    val out = Bpe.withPieces(df, "toks", merges, "pieces")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    val rows = out.select("id", "pieces").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(rows(1L).get == Seq("ab</w>", "c", "d", Bpe.EndOfWord))
    assert(rows(2L).isEmpty)
  }
}
