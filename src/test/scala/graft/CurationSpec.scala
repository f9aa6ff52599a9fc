package graft

import graft.operators.{Curation, Relational, TextOps}
import org.apache.spark.sql.functions._

/** Corpus-curation family: split determinism and proportions, leakage ⊆
  * LSH pair graph, contamination confined to the train split, repetition
  * bounds, basket pair ordering, and the A/B z-score identity — the
  * invariants the row/hash oracle can't express. */
class CurationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("split assignment is deterministic, exhaustive, and ~90/5/5") {
    val counts = Curation.splitAssign(spark, sfDir)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet == Set("train", "val", "test"))
    // hash buckets over sequential ids: bounded drift from 90/5/5
    assert(counts("train").toDouble / total > 0.85)
    assert(counts("val").toDouble / total < 0.10)
    assert(counts("test").toDouble / total < 0.10)
    // re-run yields the identical assignment (stateless hash, no RNG)
    val a = Curation.splitAssign(spark, sfDir).collect().toSeq
    val b = Curation.splitAssign(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("leakage pairs are exactly the cross-split subset of the LSH graph") {
    val leak = Curation.splitLeakage(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = TextOps.minhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leak.subsetOf(all))
    // every reported pair truly straddles splits
    Curation.splitLeakage(spark, sfDir).collect().foreach { r =>
      assert(r.getString(2) != r.getString(3))
    }
  }

  test("domain cap: ≤K per source, hash-uniform selection ≡ window form, no WindowExec") {
    val K = 10
    val rows = Curation.domainCap(spark, sfDir).collect()
    val perSource = Tables.documents(spark, sfDir).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.groupBy(_.getString(0))
    assert(kept.keySet == perSource.keySet, "no source silently dropped")
    kept.foreach { case (src, rs) =>
      assert(rs.length == math.min(K.toLong, perSource(src)), s"$src cap")
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq, s"$src ranks")
    }
    // the aggregator must select the SAME documents as the window
    // formulation (k smallest hashes per source, ties by doc_id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("hkey"), col("doc_id"))
    val windowForm = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        pmod(pmod(col("doc_id"), lit(2147483647L)) * 2654435761L, lit(1000003L)).as("hkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSet == windowForm)
    // scale pin: the cap runs as a bounded aggregation, not a per-domain
    // window sort (the whole point — map-side K rows per source)
    val plan = Curation.domainCap(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "domainCap must not sort domains under a window")
  }

  test("contamination reports train docs only, with positive gram counts") {
    val rows = Curation.contamination(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // recompute the split of each reported doc — must be train
      val bucket = (Curation.knuthFoldLong(r.getLong(0)) * 2654435761L) % 1000L
      assert(bucket < 900, s"doc ${r.getLong(0)} not in train split")
      assert(r.getLong(1) > 0)
    }
  }

  test("overlap fractions respect the split sides, the 30% gate, and (0,1] bounds") {
    val rows = Curation.overlapFraction(spark, sfDir).collect()
    assert(rows.nonEmpty, "the fixture's planted dups must produce at least one pair")
    rows.foreach { r =>
      val (testDoc, trainDoc) = (r.getLong(0), r.getLong(1))
      val (shared, total, frac) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert((Curation.knuthFoldLong(testDoc) * 2654435761L) % 1000L >= 950, s"$testDoc not in test split")
      assert((Curation.knuthFoldLong(trainDoc) * 2654435761L) % 1000L < 900, s"$trainDoc not in train split")
      assert(shared > 0 && shared <= total)
      assert(shared * 10 >= total * 3, "row below the 30% gate leaked through")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("gramNovelty's hash-keyed grams match an exact string-tuple local recompute") {
    import spark.implicits._
    // the r11 gram4 reshape keys grams by xxhash64 of the token tuple —
    // this pins the hash-keyed counts to the collision-free definition
    // (distinct STRING 4-gram sets, first-seen by ascending doc_id)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val gsets = docs.map { case (id, text) =>
      // limit -1: keep trailing empty tokens, matching Spark's split()
      val t = text.split(" ", -1)
      id -> (if (t.length < 4) Set.empty[Seq[String]]
             else (0 to t.length - 4).map(i => t.slice(i, i + 4).toSeq).toSet)
    }
    val firstSeen = scala.collection.mutable.Map.empty[Seq[String], Long]
    for ((id, gs) <- gsets; g <- gs.toSeq.sortBy(_.mkString(" ")))
      if (!firstSeen.contains(g)) firstSeen(g) = id
    val expect = gsets.filter(_._2.nonEmpty).map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => firstSeen(g) == id).toLong))
    }.toMap
    val got = Curation.gramNovelty(spark, sfDir)
      .select("doc_id", "n_grams", "n_novel")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("repetition ratios stay in [0,1] and flagged <= docs") {
    val rows = Curation.repetitionScreen(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, avgRep, flagged) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(avgRep >= 0.0 && avgRep <= 1.0)
      assert(flagged >= 0 && flagged <= nDocs)
    }
  }

  test("repetition screen matches an exact string-bigram recompute") {
    // the r10 hash-keyed distinct (xxhash64 bigram codes) must agree
    // with the collision-free definition: distinct STRING bigrams per
    // doc, micro-averaged per source — a collision would deflate
    // n_distinct and surface here
    val docs = graft.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perDoc = docs.map { case (src, text) =>
      val t = text.split(" ", -1)
      val g = t.dropRight(1).zip(t.drop(1)).toSeq
      (src, g.length.toLong, g.distinct.length.toLong)
    }.filter(_._2 > 0)
    val expected = perDoc.groupBy(_._1).map { case (src, ds) =>
      val (nd, ng) = (ds.map(_._3).sum, ds.map(_._2).sum)
      val flagged = ds.count { case (_, n, d) => 1.0 - d.toDouble / n > 0.1 }
      src -> ((ds.length.toLong,
        BigDecimal(1.0 - nd.toDouble / ng).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        flagged.toLong))
    }
    val got = Curation.repetitionScreen(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("basket pairs: canonical ordering, bounded co-count, positive lift") {
    val rows = Relational.basketPairs(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val counts = rows.map(_.getLong(2))
    // sorted by co-count descending (the top-k contract)
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // p1 < p2 canonical form
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("abtest: pooled z matches a local recomputation from the counts") {
    val r = Relational.abTest(spark, sfDir).collect().head
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n0 > 0 && n1 > 0 && c0 <= n0 && c1 <= n1)
    val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    val zRounded = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(6) - zRounded) < 1e-9)
  }

  test("kanon: generalization ladder is monotone (merging only helps anonymity)") {
    val rows = Curation.kAnonymity(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("L0_band500", "L1_band2000", "L2_nation"))
    val byLevel = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6))).toMap
    val Seq((g0, k0, r0, l0), (g1, k1, r1, l1), (g2, k2, r2, l2)) =
      Seq("L0_band500", "L1_band2000", "L2_nation").map(byLevel)
    // L1 bands are unions of L0 bands (2000 = 4 x 500) and L2 drops the
    // band: each coarser level merges groups of the finer one, so group
    // count shrinks, min k grows, the at-risk row mass never grows, and
    // sensitive-value diversity per group never shrinks
    assert(g0 >= g1 && g1 >= g2)
    assert(k0 <= k1 && k1 <= k2)
    assert(r0 >= r1 && r1 >= r2)
    assert(l0 <= l1 && l1 <= l2)
    // fully generalized level: 25 nations, everyone in a nation-sized crowd
    assert(g2 <= 25)
  }

  test("stratifiedExact: exactly ceil(n/10) per stratum, deterministic draw") {
    val picked = Curation.stratifiedExact(spark, sfDir).collect()
    val perSource = picked.groupBy(_.getString(0))
    val stratumSizes = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum is represented with exactly ceil(n/10) picks
    assert(perSource.keySet == stratumSizes.keySet)
    perSource.foreach { case (src, rows) =>
      val n = stratumSizes(src)
      assert(rows.length == ((n + 9) / 10).toInt,
        s"$src: ${rows.length} picks from stratum of $n")
      // ranks are 1..k and n_stratum echoes the true stratum size
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length.toLong))
      assert(rows.forall(_.getLong(3) == n))
    }
    // the draw is a pure function of doc_id — a rerun picks the same docs
    val again = Curation.stratifiedExact(spark, sfDir).collect()
    assert(picked.map(r => (r.getString(0), r.getLong(2))).toSet ==
      again.map(r => (r.getString(0), r.getLong(2))).toSet)
  }
}
