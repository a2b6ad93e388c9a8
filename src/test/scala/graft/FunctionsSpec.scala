package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Unit + property tests for the expression kits (F1-F10, A9). Property
  * checks use seeded random cases (scalacheck's scalatest bridge is not on
  * the classpath; determinism is a feature here anyway).
  */
class FunctionsSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def tok1(s: String): Seq[String] =
    Seq(s).toDF("text").select(TF.tokenize(col("text"))).as[Seq[String]].head()

  test("F1: canonical tokenizer matches the declared spec") {
    assert(tok1("Hello, World! 123") == Seq("hello", "world", "123"))
    assert(tok1("  a   b  ") == Seq("a", "b"))
    assert(tok1("...") == Seq.empty)
    assert(tok1("don't STOP-me now") == Seq("dont", "stopme", "now"))
    // newlines/tabs are separators, never deleted into word-merges
    assert(tok1("end.\nStart\tnow") == Seq("end", "start", "now"))
  }

  test("F1: tokenizer is idempotent on its own output (20 random cases)") {
    val cases = Seq.fill(20)(Seq.fill(rnd.nextInt(30))(rnd.nextPrintableChar()).mkString)
    for (s <- cases) {
      val once = tok1(s)
      assert(tok1(once.mkString(" ")) == once, s"not idempotent for: $s")
    }
  }

  test("F1: native graft_tokenize matches the composed regex form exactly") {
    // adversarial inputs: every \s class member, unicode case folding,
    // removed-char joins, unicode whitespace (NBSP is NOT Java \s — it is
    // removed, joining neighbors), empties everywhere
    val nasty = Seq(
      "Hello, World! 123", "  a   b  ", "...", "don't STOP-me now",
      "end.\nStart\tnow", "ab", "a\fb", "a\rb", "a b", "ÀÉÎ öü ß",
      "x9y", "", " ", "\t\n", "a--b  c__d", "ＡＢＣ", "１２３", "Ω≈ç√∫",
      "tab\tsep", "mixed   \r\n\t   runs")
    val df = nasty.toDF("text")
      .select(TF.tokenize(col("text")).as("nat"), TF.tokenizeComposed(col("text")).as("com"))
      .as[(Seq[String], Seq[String])].collect()
    for (((n, c), s) <- df.zip(nasty)) assert(n == c, s"diverged on ${s.map(_.toInt)}: $n vs $c")
    // and over the real fixture corpus
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(TF.tokenize(col("text")).as("nat"), TF.tokenizeComposed(col("text")).as("com"))
    assert(docs.where(not(col("nat") === col("com"))).count() == 0)
  }

  test("shingles: short docs yield empty, others n-2 shingles") {
    val rows = Seq("a b", "a b c d").toDF("text")
      .select(TF.shingles(TF.tokenize(col("text")), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq.empty)
    assert(rows(1) == Seq("a b c", "b c d"))
  }

  test("A9: argmax returns FIRST maximal index (ND4J tie semantics)") {
    val df = Seq(Seq(1.0f, 5.0f, 5.0f, 2.0f)).toDF("v")
    assert(df.select(VF.argmax1(col("v"))).as[Long].head() == 2L) // 1-based first max
  }

  test("A9 property: argmax position always holds the first array max") {
    val cases = Seq.fill(20)(Seq.fill(1 + rnd.nextInt(10))(rnd.nextInt(20).toFloat))
    for (xs <- cases) {
      val (pos, mx) = Seq(xs).toDF("v")
        .select(VF.argmax1(col("v")), array_max(col("v"))).as[(Long, Float)].head()
      assert(xs(pos.toInt - 1) == mx)
      assert(xs.indexOf(mx) == pos.toInt - 1, s"not first occurrence for $xs")
    }
  }

  test("F10 property: min-max scaled values are in [0,1]") {
    val cases = Seq.fill(10)(Seq.fill(5)(rnd.nextDouble() * 2000 - 1000))
    for (xs <- cases) {
      val scaled = xs.toDF("x")
        .select(VF.minMaxScale(col("x"), lit(xs.min), lit(xs.max)).as("s"))
        .as[Double].collect()
      assert(scaled.forall(s => s >= 0.0 && s <= 1.0))
    }
  }

  test("cosine: self-similarity 1, opposite -1, zero vector null") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(-1.0f, -2.0f), Seq(0.0f, 0.0f))).toDF("a", "b", "z")
    val r = df.select(
      VF.cosine(col("a"), col("a")), VF.cosine(col("a"), col("b")),
      VF.cosine(col("a"), col("z"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
    assert(r.isNullAt(2))
  }

  test("F2-F4/F6: scalar/array ops") {
    val df = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("v")
    val r = df.select(
      VF.arraySum(VF.addScalar(col("v"), 1.0)),
      VF.arraySum(VF.mulScalar(col("v"), 2.0)),
      size(VF.fill(0.0, lit(4))),
      size(concat(col("v"), col("v")))).head()
    assert(r.getDouble(0) == 9.0)
    assert(r.getDouble(1) == 12.0)
    assert(r.getInt(2) == 4)
    assert(r.getInt(3) == 6)
  }

  test("MSE: zero for identical vectors, exact for known diff") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 4.0f))).toDF("a", "b")
    val r = df.select(VF.mse(col("a"), col("a")), VF.mse(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 2.0) // ((0)^2 + (2)^2) / 2
  }

  test("hash32 is md5-prefix-stable and 32-bit") {
    val r = Seq("hello").toDF("s").select(TF.hash32(col("s"))).as[Long].head()
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    assert(r == expected)
    assert(r >= 0 && r < (1L << 32))
  }

  test("VectorMean aggregator: ragged vector lengths zero-pad instead of crashing") {
    import org.apache.spark.sql.functions.udaf
    val df = Seq((1, Seq(2.0f, 4.0f)), (1, Seq(6.0f)), (1, Seq(1.0f, 1.0f, 9.0f)))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(udaf(graft.functions.VectorMean).apply(col("v")).as("c"))
      .select("c").as[Seq[Double]].head()
    assert(out == Seq(3.0, 5.0 / 3, 3.0)) // sums (9,5,9)/3
  }

  test("VectorMean aggregator: merge preserves counts from empty-sum partials") {
    // A partial that saw only zero-length vectors has an empty sum but a
    // nonzero count; merging it must still add that count, so the mean
    // divisor is partitioning-independent (ADVICE round 2).
    val VM = graft.functions.VectorMean
    val emptyWithCount = VM.reduce(VM.zero, Seq.empty[Float]) // (empty, 1)
    assert(emptyWithCount._1.isEmpty && emptyWithCount._2 == 1L)
    val nonEmpty = VM.reduce(VM.zero, Seq(6.0f)) // (Array(6.0), 1)
    val m1 = VM.merge(emptyWithCount, nonEmpty)
    val m2 = VM.merge(nonEmpty, emptyWithCount)
    assert(m1._2 == 2L && m2._2 == 2L)
    assert(VM.finish(m1) == Seq(3.0) && VM.finish(m2) == Seq(3.0))
    // and a distributed check: mixing empty and non-empty vectors across
    // many partitions still divides by the total row count
    val df = spark.range(0, 8, 1, 8).selectExpr("id % 4 as g",
      "CASE WHEN id < 4 THEN array(CAST(8.0 AS FLOAT)) ELSE array() END AS v")
    import org.apache.spark.sql.functions.udaf
    val out = df.groupBy("g").agg(udaf(VM).apply(col("v")).as("c"))
      .select("c").as[Seq[Double]].collect()
    assert(out.forall(_ == Seq(4.0)), out.mkString(",")) // 8.0 / 2 rows
  }

  test("VectorMean aggregator: per-group centroid equals the exploded mean") {
    import org.apache.spark.sql.functions.udaf
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val viaUdaf = emb.groupBy("label")
      .agg(udaf(graft.functions.VectorMean).apply(col("embedding")).as("centroid"))
      .select(col("label"), element_at(col("centroid"), 1).as("c1"))
      .as[(Int, Double)].collect().toMap
    val viaExplode = emb
      .select(col("label"), element_at(col("embedding"), 1).cast("double").as("v"))
      .groupBy("label").agg(avg("v").as("c1"))
      .as[(Int, Double)].collect().toMap
    assert(viaUdaf.keySet == viaExplode.keySet)
    for ((k, v) <- viaExplode) assert(math.abs(viaUdaf(k) - v) < 1e-9, s"label $k")
  }

  test("langId picks the list with most hits, 'und' when none") {
    val preds = Seq("the cat and the dog", "der hund und die katze ist", "xyzzy qwerty")
      .toDF("text").select(TF.langId(TF.tokenize(col("text"))).as("l"))
      .as[String].collect().toSeq
    assert(preds == Seq("en", "de", "und"))
  }

  test("langIdNgram classifies real-language samples via character trigrams") {
    val preds = Seq(
      "the thing is heating up and the ion engine is working",
      "ich habe einen schnellen hund und der ist schoen",
      "le renard est dans les bois et il est beau",
      "el perro es uno de los animales una maravilla",
      "0123 9988 7766")
      .toDF("text").select(TF.langIdNgram(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(preds == Seq("en", "de", "fr", "es", "und"), s"got $preds")
  }

  test("E5: repetitionRatio measures the duplicated n-gram fraction") {
    def rep(s: String, n: Int): Double =
      Seq(s).toDF("text")
        .select(TF.repetitionRatio(TF.tokenize(col("text")), n)).as[Double].head()
    // "a b a b a": bigrams [a b, b a, a b, b a] -> 4 total, 2 distinct
    assert(rep("a b a b a", 2) == 0.5)
    assert(rep("all words here are different", 2) == 0.0)
    assert(rep("spam spam spam spam", 1) == 0.75) // 4 unigrams, 1 distinct
    assert(rep("short", 2) == 0.0) // no bigram exists -> 0, not null/NaN
  }

  test("E8c: overlapping chunks reproduce the brute-force chunking exactly") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TF.tokenize(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    val expected = toks.filter(_._2.nonEmpty).flatMap { case (id, ts) =>
      val n = ts.length
      (0 until n by 96).zipWithIndex.map { case (st, ci) =>
        val chunk = ts.slice(st, math.min(st + 128, n))
        (id, ci.toLong, st.toLong, chunk.length.toLong, md5hex(chunk.mkString(" ")))
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = graft.queries.Catalog.byName("e8_overlap_chunks").run(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == expected, s"chunking drifted: got ${got.size} vs ${expected.size} rows")
    // consecutive full chunks overlap by exactly window - stride = 32 tokens
    for (Seq((id1, _, s1, l1, _), (id2, _, s2, _, _)) <- got.sliding(2)
         if id1 == id2 && l1 == 128L)
      assert(s1 + l1 - s2 == 32L, s"doc $id1: overlap ${s1 + l1 - s2} != 32")
  }

  test("E5l: duplicate n-gram coverage matches a brute-force recompute") {
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TF.tokenize(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    val grams = toks.map { case (id, ts) =>
      id -> ts.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val dfreq = grams.flatMap { case (id, g) => g.iterator.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    val expected = grams.map { case (id, g) =>
      (id, g.size.toLong, g.count(dfreq(_) >= 2).toLong)
    }.sortBy(_._1).toSeq
    val got = graft.queries.Catalog.byName("e5_dup_ngram_coverage")
      .run(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    graft.operators.Pinned.release()
    assert(got.map(r => (r._1, r._2, r._3)) == expected)
    for ((id, ng, nd, frac) <- got)
      assert(math.abs(frac - nd.toDouble / ng) < 1e-6, s"doc $id frac $frac")
    // the fixture contains exact duplicate documents; their coverage is 1.0
    assert(got.exists(_._4 == 1.0), "no fully-duplicated doc found in fixture")
  }

  test("A10 sketch: approx_count_distinct within 5% of exact per group") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val both = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    for ((grp, exact, approx) <- both)
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"$grp: approx $approx vs exact $exact drifts beyond 5%")
  }

  test("E1u: canonicalUrl — every documented rule, one probe each") {
    val cases = Seq(
      // scheme+host lowercase, default port dropped, trailing slash, fragment
      "HTTP://WWW.Example.COM:80/Docs/1/#frag" -> "http://www.example.com/Docs/1",
      // https default port; path case PRESERVED
      "https://Host.com:443/A/B" -> "https://host.com/A/B",
      // non-default port kept; wrong-scheme default port kept
      "http://h.com:8080/x" -> "http://h.com:8080/x",
      "https://h.com:80/x" -> "https://h.com:80/x",
      // tracking params dropped, remainder sorted; empty query collapses
      "http://h.com/p?utm_source=a&b=2&a=1&fbclid=zz" -> "http://h.com/p?a=1&b=2",
      "http://h.com/p?utm_campaign=x" -> "http://h.com/p",
      "http://h.com/p?" -> "http://h.com/p",
      // r10: 'ref' is SEMANTIC (a branch, a section) and is KEPT — unlike
      // utm_*/fbclid, stripping it wrongly merged distinct pages;
      // 'refresh=1' also kept (never was an anchor match)
      "http://h.com/p?ref=main&refresh=1" -> "http://h.com/p?ref=main&refresh=1",
      // empty path -> '/', root slash collapse
      "http://h.com" -> "http://h.com/",
      "http://h.com///" -> "http://h.com/",
      // a '?' INSIDE the fragment is not a query (review r8: an unanchored
      // extract resurrected it, wrongly merging with the real ?page=2 URL)
      "http://h.com/p#sec?page=2" -> "http://h.com/p",
      // userinfo keeps its case (case-sensitive per RFC 3986); host folds
      "http://Alice@H.com/x" -> "http://Alice@h.com/x",
      // whitespace trim; malformed (no scheme) passes through trimmed
      "  http://h.com/x  " -> "http://h.com/x",
      "  not a url  " -> "not a url")
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), graft.functions.TextFunctions.canonicalUrl(col("url")).as("canon"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases)
      assert(got(in) == want, s"canonicalUrl('$in') = '${got(in)}', want '$want'")
  }

  test("E5o: compression ratio — repetition compresses below prose, contract on null/empty") {
    import graft.operators.Quality
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while reading a short novel about entropy"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, ""),
      (4L, null)
    ).toDF("id", "text")
    val out = Quality.withCompressionRatio(rows, "text", "ratio")
      .orderBy("id").select("ratio").as[java.lang.Double].collect().toSeq
    assert(out(3) == null, "null text must stay null")
    assert(out(2) == 1.0, "empty text pins ratio = 1.0")
    assert(out(1) < out(0), s"repetition (${out(1)}) must compress below prose (${out(0)})")
    // parity with a direct JDK Deflater call (the exact semantics the
    // operator documents: raw deflate, level 6, UTF-8 bytes)
    val s = "the quick brown fox jumps over the lazy dog while reading a short novel about entropy"
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(in); d.finish()
    val buf = new Array[Byte](8192); var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    assert(out(0) == n.toDouble / in.length, s"udf ratio ${out(0)} != direct ${n.toDouble / in.length}")
  }

  /** Review-r9 pins: the text kit null-propagates uniformly — a null text
    * must not fingerprint as the EMPTY document (concat_ws skips nulls),
    * and langIdNgram still answers 'und' for null text after dropping its
    * redundant contains() pre-scan. JsonText escapes every control char.
    */
  test("fingerprint(null) is null; langIdNgram(null) is 'und'; JsonText escapes") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        graft.functions.TextFunctions.langIdNgram(col("text")).as("lang"))
      .orderBy("id").collect()
    assert(df(0).getString(1) != null)
    assert(df(1).isNullAt(1), "null text must not collapse into md5(\"\")")
    assert(df(1).getString(2) == "und")
    // the empty STRING still fingerprints (a real, distinct document state)
    val empty = Seq(Tuple1("")).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text"))).head()
    assert(!empty.isNullAt(0))
    // r10 pins: qualityScore and bpeTokenCount null-propagate EXPLICITLY —
    // least() used to skip the null length operand (null text scored 0.6,
    // sailing through any quality gate) and both flipped with
    // spark.sql.ansi.enabled via legacy sizeOfNull = -1
    val tf = graft.functions.TextFunctions
    val q = Seq((1L, "the quick brown fox and the lazy dog of the morning"),
      (2L, null.asInstanceOf[String])).toDF("id", "text")
      .select(col("id"),
        tf.qualityScore(col("text"), tf.tokenize(col("text"))).as("quality"),
        tf.bpeTokenCount(col("text")).as("bpe"))
      .orderBy("id").collect()
    assert(!q(0).isNullAt(1) && q(0).getDouble(1) > 0.0)
    assert(q(1).isNullAt(1), "null text must score NULL, never 0.6")
    assert(!q(0).isNullAt(2) && q(0).getInt(2) > 0)
    assert(q(1).isNullAt(2), "null text must count NULL tokens, never -1")
    assert(graft.JsonText.quote("a\"b\\c\nd\te\u0001f") ==
      "\"a\\\"b\\\\c\\nd\\te\\u0001f\"")
  }

  /** Review-r9 pin: the tokenizer treats vertical tab as whitespace (Java
    * \s), and the DuckDB oracle twin must spell that class EXPLICITLY —
    * RE2's \s excludes \x0b, so the shorthand silently joins tokens the
    * Spark side splits.
    */
  test("tokenize splits on vertical tab; the oracle twin spells the class explicitly") {
    import org.apache.spark.sql.functions.col
    val toks = Seq(Tuple1("end\u000Bstart two")).toDF("text")
      .select(graft.functions.TextFunctions.tokenize(col("text"))).head()
      .getSeq[String](0)
    assert(toks == Seq("end", "start", "two"), s"got $toks")
    assert(graft.queries.TextQueries.duckToks.contains("\\x0b"),
      "oracle whitespace class must name \\x0b explicitly (RE2 \\s omits it)")
  }
}
