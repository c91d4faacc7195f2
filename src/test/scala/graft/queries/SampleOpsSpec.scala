package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SampleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("split assignment is deterministic, exhaustive, and ~80/10/10") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val splits = SampleOps.withSplit(docs)
      .groupBy("split").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(splits.values.sum === n, "every document gets exactly one split")
    assert(splits.keySet.subsetOf(Set("train", "valid", "test")))
    // Hash buckets are uniform enough that train lands near 80% even on
    // the small fixture.
    val trainFrac = splits.getOrElse("train", 0L).toDouble / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction was $trainFrac")

    // Rerun yields the identical assignment (the whole point).
    val again = SampleOps.withSplit(docs)
      .groupBy("split").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(again === splits)
  }

  test("decontam flags planted train/test duplicates, bounded by train size") {
    val rows = SampleOps.decontam(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, train, cont) =>
      assert(cont >= 0 && cont <= train, "contaminated is a subset of train")
    }
    // The corpus plants exact duplicates, so SOME train/test shingle
    // overlap must exist across the whole corpus.
    assert(rows.map(_._3).sum > 0, "expected at least one contaminated doc")
  }

  test("decontam stoplist drops boilerplate trigrams, keeps rare-trigram hits") {
    import spark.implicits._
    // A boilerplate trigram shared by MORE than DecontamMaxDf documents
    // (including the test split) must NOT flag anyone; a rare trigram
    // shared by exactly one train doc and the test doc must.
    val boiler = Seq("all", "rights", "reserved")
    val rare = Seq("zephyr", "quartz", "gnomon")
    val n = SampleOps.DecontamMaxDf + 5
    val rows =
      // n train docs carrying only the boilerplate trigram...
      (1 to n).map(i => (i.toLong, "train", boiler)) ++
        // ...one train doc also carrying the rare trigram...
        Seq((100L, "train", rare)) ++
        // ...and the test doc carrying both.
        Seq((200L, "test", boiler ++ rare))
    val base = rows.toDF("doc_id", "split", "toks")
      .select(col("doc_id"), lit("en").as("lang"), col("split"),
        DedupOps.shingleSetOfTokens(col("toks")).as("shset"))
    val contaminated = SampleOps.testContaminatedTrainDocs(base)
      .as[Long].collect().toSet
    assert(contaminated === Set(100L),
      "only the rare-trigram doc is contamination; boilerplate is stoplisted")
  }

  test("shard packing is exhaustive with contiguous shard ids") {
    val rows = SampleOps.packShards(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, shards) =>
      val ids = shards.map(_._3).sorted.toSeq
      assert(ids === (0L until ids.length.toLong), s"non-contiguous shards: $ids")
    }
    // No tokens lost: shard totals must equal the train split's total.
    val trainTokens = SampleOps.withSplit(Tables.documents(spark, dir))
      .filter(col("split") === "train")
      .select(size(TextOps.tokens(col("text"))).cast("long").as("t"))
      .as[Long].collect().sum
    assert(rows.map(_._5).sum === trainTokens)
  }

  test("stratified equals the per-language window top-k it replaces") {
    import org.apache.spark.sql.expressions.Window
    val got = SampleOps.stratified(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    // The single-task-per-language reference formulation the aggregator
    // exists to avoid at scale: row_number over (h, doc_id) per lang.
    val w = Window.partitionBy("lang").orderBy("h", "doc_id")
    val want = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        pmod(DedupOps.portable64(concat(lit("strat:"), col("doc_id").cast("string"))),
          lit(1L << 50)).as("h"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= SampleOps.StratifiedK)
      .select(col("lang"), col("rank"), col("doc_id"), col("h"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.sorted === want.sorted)
    // Every language is represented with exactly min(K, langDocs) rows.
    val perLang = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val gotPerLang = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(gotPerLang === perLang.map { case (l, c) =>
      l -> math.min(c, SampleOps.StratifiedK.toLong) })
  }

  test("composed corpus pipeline only ever removes documents") {
    val rows = SampleOps.corpusPipeline(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(r => (r._1, r._2)) === rows.map(r => (r._1, r._2)).sorted)
    rows.foreach { case (_, split, docs, tokens) =>
      assert(Set("train", "valid", "test").contains(split))
      assert(docs > 0L && tokens > 0L)
      // The quality gate enforces >= 20 tokens per surviving doc.
      assert(tokens >= docs * 20L, s"$split tokens must respect the gate")
    }
    // Dedup+quality+decontam can only shrink the per-language corpus
    // relative to the quality gate alone.
    val gateOnly = TextOps.corpusFilter(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._3).sum <= gateOnly.getOrElse(lang, 0L),
        s"$lang pipeline output exceeds its quality-gate bound")
    }
  }

  test("weighted sample is deterministic and weight-biased") {
    val rows = SampleOps.weighted(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.length === SampleOps.WeightedK)
    // Priorities arrive non-decreasing (the top-k head of pri asc).
    assert(rows.map(_._4) === rows.map(_._4).sorted)
    // Rerun-stable: identical winners on a second run.
    val again = SampleOps.weighted(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(again === rows)
    // Weight bias: winners skew longer than the corpus average (hash/w
    // makes large-w docs clear any threshold proportionally more often).
    val corpusAvg = Tables.documents(spark, dir)
      .agg(avg(col("n_chars"))).as[Double].collect().head
    val sampleAvg = rows.map(_._3).sum.toDouble / rows.length
    assert(sampleAvg > corpusAvg,
      s"weighted sample should skew long: sample $sampleAvg vs corpus $corpusAvg")
  }

  test("rebalance downsamples the dominant language and keeps strata") {
    val kept = SampleOps.rebalance(spark, dir)
      .as[(String, Long)].collect().toMap
    val totals = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(kept.keySet === totals.keySet, "no language is wiped out")
    val enFrac = kept("en").toDouble / totals("en")
    val deFrac = kept("de").toDouble / totals("de")
    assert(enFrac < deFrac, "dominant language must be sampled harder")
    kept.foreach { case (l, k) => assert(k <= totals(l)) }
  }

  test("temperature mixing derives rates from counts and flattens the skew") {
    val rows = SampleOps.temperature(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    val totals = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet === totals.keySet, "every language reported")
    rows.foreach { case (l, docs, ppm, kept) =>
      assert(docs === totals(l), s"$l count")
      // rate_ppm is exactly the pinned formula (sqrt is IEEE-exact).
      val want = math.min(1000000L,
        math.floor(1000000.0 * SampleOps.TempK / math.sqrt(docs.toDouble)).toLong)
      assert(ppm === want, s"$l rate")
      assert(kept >= 0L && kept <= docs)
    }
    // alpha = 0.5 flattening: the dominant language's share of the kept
    // mixture is strictly below its share of the raw corpus.
    val (domLang, domDocs) = rows.map(r => (r._1, r._2)).maxBy(_._2)
    val keptTotal = rows.map(_._4).sum.toDouble
    val docTotal = rows.map(_._2).sum.toDouble
    val domKept = rows.find(_._1 == domLang).get._4.toDouble
    assert(domKept / keptTotal < domDocs / docTotal,
      "temperature must flatten the dominant language's share")
  }

  test("mixture reweighting closes the gap between actual and target shares") {
    val rows = SampleOps.mixture(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).sum === 1000000L, "targets sum to one")
    rows.foreach { case (l, tokens, target, actual, weight, alloc) =>
      assert(tokens > 0)
      assert(actual === tokens * 1000000L / total, s"$l actual share")
      assert(weight === target * total / tokens, s"$l weight")
      assert(alloc === total * target / 1000000L, s"$l allocation")
      // The reweight is exactly what makes the domain hit its target:
      // weighted tokens / total ≈ target share (ppm-floor tolerance).
      val hit = tokens * weight / total
      assert(math.abs(hit - target) <= 1L, s"$l reweighted share $hit vs $target")
    }
    // An over-represented domain gets weight < 1e6 (downsample), an
    // under-represented one > 1e6 (upsample/extra epochs).
    rows.foreach { case (_, tokens, target, _, weight, _) =>
      val actualShare = tokens * 1000000L / total
      if (actualShare > target) assert(weight <= 1000000L)
      if (actualShare < target) assert(weight >= 1000000L)
    }
  }

  test("grouped splits keep a planted straddling component on one side") {
    val docs = (1L to 200L).toDF("doc_id")
    // Find a pair the PLAIN per-doc hash puts on opposite sides of the
    // train/test line, then plant them as one near-dup component.
    val plain = SampleOps.withSplit(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val a = plain.collectFirst { case (id, "train") => id }.get
    val b = plain.collectFirst { case (id, "test") => id }.get
    val rep = math.min(a, b)
    val labels = Seq((a, rep), (b, rep)).toDF("doc_id", "rep")
    val out = SampleOps.groupedSplitsOf(docs, labels)
      .as[(Long, Long, String, String, Boolean)].collect()
    assert(out.length === 200)
    val byId = out.map(r => r._1 -> r).toMap
    // The component's members share ONE split (keyed on the rep)...
    assert(byId(a)._3 === byId(b)._3, "component members must share a split")
    assert(byId(a)._2 === rep && byId(b)._2 === rep)
    assert(byId(a)._5 && byId(b)._5)
    // ...even though their plain per-doc splits disagree (the leak).
    assert(byId(a)._4 === "train" && byId(b)._4 === "test")
    // Singletons key on themselves: grouped ≡ plain, not in a component.
    out.filter(r => r._1 != a && r._1 != b).foreach { r =>
      assert(!r._5 && r._2 === r._1 && r._3 === r._4)
    }
  }

  test("grouped splits on the fixture: exhaustive, component-constant") {
    val out = SampleOps.groupedSplits(spark, dir)
      .as[(Long, Long, String, String, Boolean)].collect()
    assert(out.length.toLong === Tables.documents(spark, dir).count())
    // Every verified component lands wholly in one split, and its
    // members carry the component rep as their split key.
    val comps = out.filter(_._5).groupBy(_._2)
    assert(comps.nonEmpty, "fixture plants near-dup components")
    comps.foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"component $rep straddles splits")
      assert(members.map(_._2).forall(_ == rep))
    }
    // Members agree with the registered clustering outcome.
    val labels = DedupOps.groupLabels(spark, dir)
      .as[(Long, Long)].collect().toMap
    out.foreach { r =>
      assert(labels.get(r._1).fold(!r._5 && r._2 == r._1)(rep =>
        r._5 && r._2 == rep))
    }
  }
}
