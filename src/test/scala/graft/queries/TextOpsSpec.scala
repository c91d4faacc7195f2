package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("redactPii masks emails and phones, leaves clean text alone") {
    val out = Seq(
      "write to jane.doe@example.org today",
      "call +1-555-0199 or +44-201-3000 now",
      "no pii here at all")
      .toDF("s")
      .select(TextOps.redactPii(col("s")).as("r"))
      .as[String].collect().toSeq
    assert(out === Seq(
      "write to <EMAIL> today",
      "call <PHONE> or <PHONE> now",
      "no pii here at all"))
  }

  test("boilerplateStrip removes the shared template, keeps order and the tail") {
    // Two docs share an identical ChunkTokens-token header (the
    // template); each has a distinct ChunkTokens-token body chunk and
    // a short tail. A third doc is all-template. Chunk boundaries are
    // exact multiples, so the planted layout is unambiguous.
    val C = TextOps.ChunkTokens
    val template = (1 to C).map(_ => "tpl").mkString(" ")
    val bodyA = (1 to C).map(i => s"a$i").mkString(" ")
    val bodyB = (1 to C).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$template $bodyA tail1 tail2"),
      (2L, s"$template $bodyB"),
      (3L, template))
      .toDF("doc_id", "text")
    val got = TextOps.boilerplateStripOf(df)
      .select("doc_id", "n_chunks", "kept_chunks", "dropped_chunks", "cleaned")
      .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 2L, 1L, 1L, s"$bodyA tail1 tail2"),
      (2L, 2L, 1L, 1L, bodyB),
      (3L, 1L, 0L, 1L, "")))
    // The detector and the strip agree on what boilerplate is: the
    // dropped counts equal boilerplateOf's boiler_chunks per doc.
    val det = TextOps.boilerplateOf(df)
      .select("doc_id", "boiler_chunks")
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, _, _, dropped, _) =>
      assert(det(id) === dropped, s"detector/strip drift on doc $id")
    }
  }

  test("keyphrase scores match hand-computed RAKE degree/freq ppm") {
    // Phrases: "machine learning" x2, "machine" x1.
    // machine: freq 3, degree 2+2+1=5 -> 5e6 div 3 = 1666666.
    // learning: freq 2, degree 4     -> 4e6 div 2 = 2000000.
    // score("machine learning") = 3666666; score("machine") = 1666666.
    val df = Seq(
      (1L, "machine learning of machine"),
      (2L, "machine learning"))
      .toDF("doc_id", "text")
    val got = TextOps.keyphrasesOf(df)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("machine learning", 2L, 3666666L),
      ("machine", 1L, 1666666L)))
  }

  test("phraseFold splits maximal stopword-free runs, never emits empties") {
    val out = Seq(
      "the quick brown fox of a lazy dog",  // lead/mid/trail-interior stops
      "the a of and",                        // all stopwords -> no phrases
      "spark engine",                        // no stopwords -> one run
      "")                                    // empty doc -> no phrases
      .toDF("text")
      .select(TextOps.phraseFold("filter(split(text, ' '), t -> t != '')").as("ph"))
      .as[Seq[String]].collect().toSeq
    assert(out === Seq(
      Seq("quick brown fox", "lazy dog"),
      Seq.empty,
      Seq("spark engine"),
      Seq.empty))
  }

  test("diversity ppm on planted degenerate and all-distinct docs") {
    val df = Seq((1L, "aa aa aa"), (2L, "a b c d"), (3L, "x y y"), (4L, "solo"))
      .toDF("doc_id", "text")
    // same pipeline as the registered query, against the planted frame
    val rows = df
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"), sum(col("c") * (col("c") - 1)).as("coll"))
      .filter(col("n") >= 2)
      .select(col("doc_id"),
        expr("(1000000 * ((n * (n - 1)) - coll)) div (n * (n - 1))").as("ppm"))
      .as[(Long, Long)].collect().toMap
    assert(rows(1L) === 0L)        // "aa aa aa": every pair collides
    assert(rows(2L) === 1000000L)  // all distinct: no pair collides
    assert(rows(3L) === 666666L)   // 3 tokens, one dup pair of 6 ordered... 1 - 2/6
    assert(!rows.contains(4L))     // single-token docs have no pairs
  }

  test("redact plants exactly one email and one phone per document") {
    val rows = TextOps.redact(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, emails, phones, rawLen, redLen) =>
      assert(emails === 1L, s"doc $id email count")
      assert(phones === 1L, s"doc $id phone count")
      assert(redLen < rawLen, s"doc $id must shrink under redaction")
    }
  }

  test("rarity counts occurrences of tokens with doc-frequency <= RareMaxDf") {
    // "aa" is in 3 docs (> RareMaxDf=2, common); bb/cc/dd are in 1 doc
    // each (rare); "ee" is in 2 docs (boundary: still rare).
    val df = Seq(
      (1L, "aa bb ee"), (2L, "aa cc ee"), (3L, "aa dd"))
      .toDF("doc_id", "text")
    val rows = TextOps.rarityOf(df)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, tok, rare, ppm) => id -> ((tok, rare, ppm)) }.toMap
    assert(rows(1L) === ((3L, 2L, 666666L)))
    assert(rows(2L) === ((3L, 2L, 666666L)))
    assert(rows(3L) === ((2L, 1L, 500000L)))
  }

  test("boilerplate flags chunks shared across docs, not unique content") {
    // 8-token template block shared by docs 1 and 2 as their first
    // chunk; doc 3 is all-unique; doc 4 is too short to chunk at all.
    val template = "terms of service apply to all content here"
    val df = Seq(
      (1L, template + " unique tail one two three four five six"),
      (2L, template + " other words in this second document body x"),
      (3L, "eight completely unique tokens in this document exactly"),
      (4L, "short doc"))
      .toDF("doc_id", "text")
    val rows = TextOps.boilerplateOf(df)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, b, ppm) => id -> ((n, b, ppm)) }.toMap
    assert(rows(1L) === ((2L, 1L, 500000L)))
    assert(rows(2L) === ((2L, 1L, 500000L)))
    assert(rows(3L) === ((1L, 0L, 0L)))
    assert(rows(4L) === ((0L, 0L, 0L)))
  }

  test("canonicalUrl strips fragment and tracking params, folds case") {
    val got = Seq(
      "https://WWW.Example.COM/p/1?x=1&utm_source=a&utm_medium=b#frag",
      "https://www.example.com/p/1?x=1",
      "https://other.org/q?x=2&utm_campaign=z")
      .toDF("u").select(TextOps.canonicalUrl(col("u"))).as[String].collect()
    assert(got(0) === "https://www.example.com/p/1?x=1")
    assert(got(0) === got(1), "variants must collapse to one canonical URL")
    assert(got(2) === "https://other.org/q?x=2")
  }

  test("canonicalUrl handles utm params in first query position") {
    val got = Seq(
      "https://a.org/p?utm_source=x&y=1",   // leading utm, another param survives
      "https://a.org/p?utm_source=x",       // utm is the only param
      "https://a.org/p?utm_a=1&utm_b=2&y=1" // several leading utm params
    ).toDF("u").select(TextOps.canonicalUrl(col("u"))).as[String].collect()
    assert(got(0) === "https://a.org/p?y=1")
    assert(got(1) === "https://a.org/p")
    assert(got(2) === "https://a.org/p?y=1")
  }

  test("tfidf ranks a doc-specific token above corpus-wide ones, scores hand-checked") {
    // 4 docs; "the" appears in all (df=4), "zebra" only in doc 0 (df=1,
    // tf=2). doc 0 scores: zebra = 2*1e6 div 1 = 2e6; the = 2*1e6 div 4
    // = 5e5 — zebra must rank first with exactly these integers.
    val docs = Seq(
      (0L, "zebra the zebra the"),
      (1L, "the cat"),
      (2L, "the dog"),
      (3L, "the bird")).toDF("doc_id", "text")
    val rows = TextOps.tfidfOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
    val doc0 = rows.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0.head._3 === "zebra" && doc0.head._4 === 2000000L)
    assert(doc0(1)._3 === "the" && doc0(1)._4 === 500000L)
    // every doc reports at most TfidfTopK keywords
    rows.groupBy(_._1).foreach { case (_, ks) =>
      assert(ks.length <= TextOps.TfidfTopK)
    }
  }

  test("ngram LM conditionals match hand-computed fractions") {
    // Bigrams: (a,b)x2 + (a,b)x1 from doc 2 (lowercase folding), (b,a)x2,
    // (a,c)x1 — prefix a totals 4, so P(b|a)=3/4, P(c|a)=1/4, P(a|b)=1.
    val df = Seq((1L, "a b a b a c"), (2L, "A B")).toDF("doc_id", "text")
    val rows = TextOps.ngramLmOf(df, 1)
      .as[(String, String, Long, Long)].collect().toSet
    assert(rows === Set(
      ("a", "b", 3L, 750000L),
      ("a", "c", 1L, 250000L),
      ("b", "a", 2L, 1000000L)))
  }

  test("repetition signals match a hand-computed document") {
    // "a b a b a": 5 tokens, 2 distinct, top bigram "a b" x2 of 4.
    val df = Seq((1L, "a b a b a"), (2L, "x y z")).toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val stats = df.select(col("doc_id"),
      size(toks).cast("long").as("tok_cnt"),
      size(array_distinct(toks)).cast("long").as("uniq_cnt"))
    assert(stats.as[(Long, Long, Long)].collect().toSet ===
      Set((1L, 5L, 2L), (2L, 3L, 3L)))

    val rep = TextOps.repetition(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rep.nonEmpty)
    rep.foreach { case (id, tokCnt, uniqCnt, dupPpm, topCnt, topPpm) =>
      assert(uniqCnt <= tokCnt, s"doc $id distinct bound")
      assert(dupPpm >= 0 && dupPpm <= 1000000L, s"doc $id dup ppm range")
      assert(topCnt >= 1L, s"doc $id has at least one bigram")
      assert(topPpm <= 1000000L, s"doc $id top-bigram ppm bounded")
    }
  }

  test("batch retrieval equals the per-query window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = TextOps.searchRankBatch(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // Ranks are contiguous from 1, at most K per query.
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted === (1L to rs.length.toLong),
        s"query $q ranks must be contiguous")
      assert(rs.length <= TextOps.SearchBatchK)
    }
    // The single-task window reference the bounded aggregator replaces.
    val allTerms = TextOps.SearchBatch.map(_._2).distinct
    val tf = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("w"))
      .filter(col("w").isin(allTerms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
    val want = tf.join(df, "w")
      .join(TextOps.SearchBatch.toDF("query_id", "w"), "w")
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("tf * (1000000 div df)")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TextOps.SearchBatchK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.sorted === want.sorted)
  }

  test("search_rank weights the rare term above the common ones") {
    val rows = TextOps.searchRank(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.length <= 15)
    // Every hit contains at least one query term, at most all of them.
    rows.foreach { case (_, score, hit) =>
      assert(hit >= 1L && hit <= TextOps.SearchTerms.length.toLong)
      assert(score > 0L)
    }
    // Scores are the sort key (desc), doc_id breaks ties.
    assert(rows.map(r => (-r._2, r._1)) === rows.map(r => (-r._2, r._1)).sorted)
    // The rare term ("dup", df~25/500) carries ~15x the idf weight of a
    // common term: the top hit must actually contain it.
    val topDoc = rows.head._1
    val text = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") === topDoc)
      .select("text").as[String].collect().head
    assert(text.toLowerCase.split(" ").contains("dup"),
      s"top-ranked doc $topDoc should contain the high-idf term")
  }

  test("sequence packing: hand-computed spans, no padding holes, boundary docs counted once per side") {
    import spark.implicits._
    val C = TextOps.PackCapacity // 512
    def doc(n: Long): String = (1L to n).map(_ => "w").mkString(" ")
    // Token spans (start, end) in concat order:
    //   d1: [0, 300)          chunk 0 only, whole
    //   d2: [300, 700)        crosses the 512 boundary -> chunks 0 and 1
    //   d3: [700, 1024)       chunk 1 only, whole, ends exactly at 2C
    //   d4: [1024, 1034)      chunk 2 only, whole (final partial chunk)
    // An empty doc contributes nothing.
    val docs = Seq(
      (1L, doc(300)), (2L, doc(400)), (3L, doc(324)), (4L, doc(10)),
      (5L, "")).toDF("doc_id", "text")
    val rows = TextOps.packChunksOf(docs)
      .select("chunk_id", "n_docs", "n_whole_docs", "tok_fill", "first_doc")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (0L, 2L, 1L, C, 1L),      // d1 whole + d2's head; full
      (1L, 2L, 1L, C, 2L),      // d2's tail + d3 whole; full
      (2L, 1L, 1L, 10L, 4L)))   // the final partial chunk
    // Conservation: fills sum to the corpus token count — packing
    // neither drops nor duplicates a token.
    assert(rows.map(_._4).sum === 300L + 400L + 324L + 10L)
  }

  test("training chunks cover every token with the configured stride and overlap") {
    import spark.implicits._
    val stride = TextOps.ChunkSize - TextOps.ChunkOverlap
    val chunks = TextOps.trainingChunks(spark, dir)
      .select("doc_id", "chunk_idx", "tok_start", "tok_len")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val nByDoc = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .as[(Long, Long)].collect().toMap
    assert(chunks.keySet === nByDoc.keySet, "every non-empty doc chunks")
    chunks.foreach { case (doc, cs) =>
      val n = nByDoc(doc)
      // Contiguous indices at the configured stride, window-bounded
      // positive lengths.
      assert(cs.map(_._2).toSeq === (0L until cs.length.toLong))
      cs.foreach { case (_, idx, start, len) =>
        assert(start === idx * stride)
        assert(len >= 1 && len <= TextOps.ChunkSize)
        assert(start + len <= n)
      }
      // Exhaustive coverage: the last chunk ends exactly at n, and each
      // next chunk starts ChunkOverlap tokens before its predecessor's
      // end (no gap a token could fall through).
      assert(cs.last._3 + cs.last._4 === n, s"doc $doc: tokens dropped at the tail")
      cs.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s2 === s1 + l1 - TextOps.ChunkOverlap)
        case _ => ()
      }
    }
  }

  test("searchPhrase counts overlapping occurrences and drops non-matches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("phrase_docs").toString
    val ph = TextOps.PhraseTerms.mkString(" ") // "merge data"
    Seq(
      (1L, s"$ph and then $ph again", "en", "t", 0L), // two occurrences
      (2L, "merge data data data merge", "en", "t", 0L), // one: only pos 1
      (3L, "data merge", "en", "t", 0L),            // reversed: no match
      (4L, "merge", "en", "t", 0L),                 // shorter than phrase
      (5L, "", "en", "t", 0L),                      // empty text
      (6L, s"MERGE DATA", "en", "t", 0L))           // lower-cased match
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextOps.searchPhrase(spark, tmp)
      .as[(Long, Long)].collect().toSeq
    // hits desc, doc_id asc; docs 3/4/5 are pruned entirely
    assert(rows === Seq((1L, 2L), (2L, 1L), (6L, 1L)))
    // overlap semantics: "data data data" holds "data data" twice
    val tmp2 = java.nio.file.Files.createTempDirectory("phrase_docs2").toString
    Seq((1L, "x y x y x y", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp2/documents.parquet")
    // drive the same expression via the registered pipeline on a phrase
    // that overlaps itself: "x y x y" occurs at positions 1 and 3 of
    // "x y x y x y" — both count.
    val hits = graft.Tables.documents(spark, tmp2)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextOps.tokens(lower(col("text"))).as("tk"))
      .select(size(org.apache.spark.sql.functions.filter(
        sequence(lit(1), size(col("tk")) - 4 + 1),
        i => slice(col("tk"), i, lit(4)) === array(lit("x"), lit("y"), lit("x"), lit("y"))))
        .as("h"))
      .as[Int].collect().head
    assert(hits === 2)
  }

  test("collocations score by exact Dice and keep the support floor") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.collocations(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= TextOps.ColTopK)
    rows.foreach { case (_, _, cab, ca, cb, dice) =>
      assert(cab >= TextOps.ColMinPair)
      assert(cab <= math.min(ca, cb), "a pair can't outnumber its words")
      assert(dice === cab * 2000000L / (ca + cb), "exact integer Dice")
    }
    val key = rows.map { case (l, r, cab, _, _, d) => (-d, -cab, l, r) }
    assert(key.sameElements(key.sorted), "rank order is deterministic")
  }

  test("hashing trick features are bounded, signed, and parity-consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.hashingTf(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val tokCounts = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") < TextOps.HashDocs)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, feats) =>
      feats.foreach { case (_, dim, w) =>
        assert(dim >= 0 && dim < TextOps.HashDims)
        assert(math.abs(w) <= tokCounts(doc))
      }
      // Each token contributes exactly ±1, so |Σ weights| ≤ tokens and
      // Σ weights has the token count's parity.
      val s = feats.map(_._3).sum
      assert(math.abs(s) <= tokCounts(doc))
      assert(((s % 2 + 2) % 2) === (tokCounts(doc) % 2),
        s"doc $doc: weight-sum parity must match token-count parity")
      // Collision cancelling really bit somewhere or not — either way
      // total mass is bounded by the token count.
      assert(feats.map(f => math.abs(f._3)).sum <= tokCounts(doc))
    }
  }

  test("window co-occurrence pairs are canonical, floored, and contain bigrams") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.windowCooccurrence(spark, dir)
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= TextOps.CoocTopK)
    rows.foreach { case (a, b, cnt) =>
      assert(a <= b, "pairs canonicalize lexically")
      assert(cnt >= TextOps.CoocMin)
    }
    val key = rows.map { case (a, b, c) => (-c, a, b) }
    assert(key.sameElements(key.sorted))
    // Distance-1 containment: the window-2 count of a pair dominates
    // its adjacent-bigram count (window pairs ⊇ adjacent pairs).
    val (ta, tb, tc) = rows.head
    val adj = graft.Tables.documents(spark, dir)
      .select(TextOps.tokens(col("text")).as("tk"))
      .select(explode(expr(
        "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), " +
          "slice(tk, 2, greatest(size(tk) - 1, 0)), (x, y) -> struct(x, y))")).as("p"))
      .filter((col("p.x") === ta && col("p.y") === tb) ||
        (col("p.x") === tb && col("p.y") === ta))
      .count()
    assert(tc >= adj, s"window count $tc must dominate adjacent count $adj")
  }

  test("count-min estimates never under-count and collide under load") {
    // 600 distinct words forced into 256 counters per row: collisions
    // are guaranteed by pigeonhole, so some overcount must be positive —
    // while the min-over-rows estimate can never drop below the truth.
    val tmp = java.nio.file.Files.createTempDirectory("cm_docs").toString
    val text = (0 until 600).map(i => s"w$i").mkString(" ") + " hot hot hot hot"
    Seq((1L, text, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextOps.countMin(spark, tmp)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === TextOps.CmTopQ)
    rows.foreach { case (w, exact, est, over) =>
      assert(est >= exact, s"$w under-counted: est $est < exact $exact")
      assert(over === est - exact)
    }
    assert(rows.head._1 === "hot" && rows.head._2 === 4L,
      "the heaviest word ranks first with its exact count")
    // Pigeonhole: 601 words in 256 counters collide in every row; the
    // probability that some probed word's FOUR counters are all
    // collision-free is essentially nil for this fixed hash family.
    assert(rows.exists(_._4 > 0L), "expected at least one overcount")
  }

  /** Sequential reference BPE: textbook overlap-counting pair stats and
    * greedy left-to-right merge application, used to pin the
    * distributed loop.
    */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Long, String, String, Long)] = {
    var seqs = words.toSeq.map { case (w, c) => (w.split("").filter(_.nonEmpty).toSeq, c) }
    val out = scala.collection.mutable.Buffer[(Long, String, String, Long)]()
    for (round <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((s, c) <- seqs; i <- 0 until s.length - 1) counts((s(i), s(i + 1))) += c
      if (counts.nonEmpty && out.length == round - 1) {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((round.toLong, l, r, cnt))
        seqs = seqs.map { case (s, c) =>
          val b = scala.collection.mutable.Buffer[String]()
          for (x <- s) {
            if (b.nonEmpty && b.last == l && x == r) b(b.length - 1) = l + r
            else b += x
          }
          (b.toSeq, c)
        }
      }
    }
    out.toSeq
  }

  test("bpe training matches the sequential reference on planted and real corpora") {
    // Planted: forces a second-level merge (the learned symbol 'ab'
    // must itself pair and win round 2) and a tie broken lexically.
    val tmp = java.nio.file.Files.createTempDirectory("bpe_docs").toString
    Seq((1L, "abab abab abc", "en", "t", 0L), (2L, "abab cd cd", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val words = Map("abab" -> 3L, "abc" -> 1L, "cd" -> 2L)
    val got = TextOps.bpeTrain(spark, tmp)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === refBpe(words, TextOps.BpeMerges))
    assert(got.head._2 === "a" && got.head._3 === "b",
      "round 1 learns the dominant pair")
    assert(got.exists(m => m._2 == "ab" || m._3 == "ab"),
      "a later round merges the learned symbol itself")

    // Real corpus: the distributed loop equals the reference computed
    // from the same word counts.
    val dir = "/root/testdata/sf0.001"
    val corpusWords = graft.Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val gotCorpus = TextOps.bpeTrain(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(gotCorpus === refBpe(corpusWords, TextOps.BpeMerges))

    // The encode report is internally consistent: every word encodes to
    // between 1 and len(word) symbols, so tokens <= symbols <= chars,
    // merges strictly compress a corpus containing the learned pairs,
    // and the ppm is the exact integer quotient.
    val enc = TextOps.bpeEncode(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (_, toks, chars, syms, ppm) =>
      assert(toks <= syms && syms < chars)
      assert(ppm === syms * 1000000L / chars)
    }
  }
}
