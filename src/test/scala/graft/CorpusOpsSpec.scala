package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Semantics of the round-6 corpus operators on shapes the fixture can't
  * pin: the triangle census on known graphs, the weighted sample's
  * determinism and size bias, the postings cap, and the mixing plan's
  * recipe invariants. (The fixture-level values are all DuckDB-oracled
  * via q_triangles / q_wsample / q_postings / q_mix / q_edit_sim.) */
class CorpusOpsSpec extends SparkSpec {

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
    import spark.implicits._
    val r = TextOps.triangleCensusOnEdges(edges.toDF("d1", "d2")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("scrub: regex redaction ≡ token-level blocklist replace on the fixture") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val block = Set("customer", "key")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val red = toks.map(t => if (block(t)) "[REDACTED]" else t).mkString(" ")
      (id, toks.count(block).toLong,
        md.digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }.sortBy(_._1).toSeq
    val got = TextOps.scrub(spark, sf)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    assert(got.exists(_._2 > 0), "blocklist never hit — the scrub is a no-op")
  }

  test("interleave: stride schedule ≡ brute-force recompute; weights non-degenerate") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
      .map { case (id, src, text) => (id, src, text.split(" ", -1).length.toLong) }
    // ntile(5) by hand: sorted by (token mass, source), first n%5 buckets
    // take the extra row — the standard assignment both engines use
    val bySrc = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val ordered = bySrc.toSeq.sortBy { case (s, t) => (t, s) }
    val n = ordered.size
    val (base, extra) = (n / 5, n % 5)
    val weightOf = ordered.zipWithIndex.map { case ((s, _), i) =>
      // row i (0-based) falls in bucket q: first `extra` buckets have
      // base+1 rows
      val q =
        if (i < extra * (base + 1)) i / (base + 1) + 1
        else (i - extra * (base + 1)) / base + extra + 1
      s -> (6L - q)
    }.toMap
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(_._1).zipWithIndex.map { case ((id, _, _), r0) =>
        val w = weightOf(src)
        val rank = r0 + 1L
        (id, src, w, rank, rank * (60L / w))
      }
    }.sortBy { case (id, src, _, _, vt) => (vt, src, id) }
      .zipWithIndex
      .map { case ((id, src, w, rank, vt), p) => (id, src, w, rank, vt, p + 1L) }
    val got = TextOps.interleave(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    assert(got.map(_._3).distinct.size > 1, "all sources got the same weight")
  }

  test("gopher rules: windowed stats ≡ brute-force per-doc recompute") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.map { case (id, text) =>
      val t = text.split(" ", -1)
      val n = t.length.toLong
      val bigs = t.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
      val top2 = if (bigs.isEmpty) 0L
        else bigs.groupBy(identity).values.map(_.size).max.toLong
      val tris = t.sliding(3).filter(_.length == 3).map(_.toSeq).toSeq
      val dup3 = (tris.size - tris.distinct.size).toLong
      val keep = n >= 20 && top2 * 10000L < 800L * math.max(n - 1, 1L) &&
        dup3 * 10000L < 200L * math.max(n - 2, 1L)
      (id, n, top2, dup3, keep)
    }.sortBy(_._1).toSeq
    val got = TextOps.gopherRules(spark, sf)
      .select("doc_id", "n_tok", "top2_cnt", "dup3_cnt", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    // the gate must actually split the fixture
    assert(got.exists(_._5) && got.exists(!_._5),
      s"keep flag is constant: ${got.count(_._5)}/${got.size}")
  }

  test("chunk overlap: stride bookkeeping ≡ brute force, incl. the short-only-chunk tail rule") {
    import spark.implicits._
    // lengths probing every boundary: the fixture has no doc under 8
    // tokens, so the keep-the-only-chunk branch only lives here
    val lens = Seq(1, 5, 8, 9, 16, 17, 20, 24, 32, 33, 40, 48, 65)
    val tmp = java.nio.file.Files.createTempDirectory("chunk_docs").toFile
    try {
      lens.zipWithIndex.map { case (n, id) =>
        val text = (0 until n).map(i => s"w$i").mkString(" ")
        (id.toLong, text, "en", "s0", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = TextOps.chunkOverlap(spark, tmp.getPath)
        .select("doc_id", "chunk_idx", "start_tok", "n_tok")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val expected = lens.zipWithIndex.flatMap { case (n, id) =>
        (0 to (n - 1) / 16).map { k =>
          (id.toLong, k.toLong, k * 16L + 1L, math.min(32L, n - k * 16L))
        }.filter(c => c._4 >= 8 || c._2 == 0)
      }
      assert(got == expected, s"got=$got\nexpected=$expected")
      // both tail branches live: a short ONLY chunk kept, a short tail dropped
      assert(got.contains((0L, 0L, 1L, 1L)), "only-chunk keep branch dead")
      assert(!got.exists(c => c._2 > 0 && c._4 < 8), "short tails must drop")
      assert(lens.exists(n => (n - 1) / 16 > 0 && n % 16 != 0),
        "fixture must exercise a dropped tail")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }

  test("vocab growth: two-level prefix sum ≡ naive running sum across blocks") {
    // The fixtures' 31-word vocabulary first-occurs entirely in bucket 1,
    // so the oracle row never exercises the multi-bucket (let alone
    // multi-BLOCK, 1024 buckets each) path of the two-level reshape.
    // Synthetic corpus: 120k docs, each introducing a fresh token every
    // 3rd doc — buckets span 3 blocks; pin against a local running sum.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("vocab_growth_docs").toFile
    try {
      (0L until 120000L).map { id =>
        val tok = if (id % 3 == 0) s"w$id" else "the"
        (id, s"the quick $tok", "en", "s0", 10L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(2)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = TextOps.vocabGrowth(spark, tmp.getPath).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // local recompute: first_doc of each token -> bucket -> running sum
      val firstDoc = scala.collection.mutable.Map.empty[String, Long]
      (0L until 120000L).foreach { id =>
        val toks = Seq("the", "quick", if (id % 3 == 0) s"w$id" else "the")
        toks.foreach(t => if (!firstDoc.contains(t)) firstDoc(t) = id)
      }
      val buckets = firstDoc.values.groupBy(d => d / 50 * 50 + 50)
        .map { case (b, ds) => (b, ds.size.toLong) }.toSeq.sortBy(_._1)
      val expect = buckets.scanLeft((0L, 0L, 0L)) {
        case ((_, _, acc), (b, n)) => (b, n, acc + n) }.drop(1)
      assert(got.length == expect.length && got.sameElements(expect),
        s"got ${got.take(5).toSeq}... expect ${expect.take(5)}...")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(tmp)
    }
  }

  test("triangle census: closed triangle with a pendant edge") {
    // 1-2-3 closed, 4 hangs off 3: deg = (2,2,3,1) → wedges 1+1+3 = 5
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) ==
      ((4L, 5L, 1L, 0.6)))
  }

  test("triangle census: a star has wedges but no triangles") {
    // hub 1 with 3 leaves: deg(1)=3 → 3 wedges, no closing edges
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == ((3L, 3L, 0L, 0.0)))
  }

  test("triangle census: K4 is fully clustered (coefficient 1)") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(census(k4) == ((6L, 12L, 4L, 1.0)))
  }

  test("weighted sample: 5 ranks per source, deterministic, keys in (0, 1]") {
    val a = TextOps.weightedSample(spark, sf).collect()
    val b = TextOps.weightedSample(spark, sf).collect()
    assert(a.sameElements(b), "A-ES draw must be reproducible")
    val bySource = a.groupBy(_.getString(0))
    bySource.foreach { case (s, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to 5L), s"ranks of $s")
    }
    assert(a.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("weighted sample: selected docs skew long (weight = length)") {
    // u^(1/w) grows with w, so winners should be longer than their source's
    // average doc — compare mean selected n_tok against the corpus mean
    val sel = TextOps.weightedSample(spark, sf)
      .agg(avg("n_tok")).head().getDouble(0)
    val all = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("double").as("n"))
      .agg(avg("n")).head().getDouble(0)
    assert(sel > all, s"selected mean $sel should exceed corpus mean $all")
  }

  test("postings: df counts the full posting, sample is capped at 10") {
    val rows = TextOps.postings(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val sample = r.getString(2).split(",")
      assert(sample.length == math.min(df, 10L), s"${r.getString(0)} sample size")
      assert(sample.map(_.toLong).sorted.sameElements(sample.map(_.toLong)), "sorted ids")
    }
    // at least one token must actually exceed the cap for the cap to be tested
    assert(rows.exists(_.getLong(1) > 10), "fixture should have a common token")
  }

  test("mixing plan: every source planned, shares sum to 1, rates feasible") {
    val rows = TextOps.mixRates(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == nSources, "no source silently dropped")
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 0.01, s"shares sum to $shareSum")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "rate in [0,1]")
      assert(r.getLong(5) <= r.getLong(2), "cannot sample more tokens than exist")
    }
    // the plan must hit the budget to within the named-domain rounding:
    // sources capped at rate 1.0 under-deliver, everything else matches
    val est = rows.map(_.getLong(5)).sum.toDouble
    val total = rows.map(_.getLong(2)).sum.toDouble
    assert(est <= total / 2 * 1.01, "plan cannot exceed the half-corpus budget")
  }

  test("temperature mix: flattens toward uniform without reordering languages") {
    val rows = TextOps.tempMix(spark, sf).collect()
    val nLangs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length == nLangs, "no language silently dropped")
    val (pRaw, pTemp) = (rows.map(_.getDouble(3)), rows.map(_.getDouble(4)))
    assert(math.abs(pRaw.sum - 1.0) < 0.01, s"raw shares sum to ${pRaw.sum}")
    assert(math.abs(pTemp.sum - 1.0) < 0.01, s"temp shares sum to ${pTemp.sum}")
    // α < 1 flattens: every below-uniform language is boosted, every
    // above-uniform language is shrunk — and strictly so away from 1/L
    val u = 1.0 / nLangs
    rows.foreach { r =>
      val (p, q, boost) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      if (p < u - 1e-9) assert(q > p && boost > 1.0, s"${r.getString(0)} not upsampled")
      if (p > u + 1e-9) assert(q < p && boost < 1.0, s"${r.getString(0)} not downsampled")
    }
    // monotone: rebalancing must not swap the rank order of languages
    val byP = rows.sortBy(_.getDouble(3)).map(_.getString(0)).toSeq
    val byQ = rows.sortBy(_.getDouble(4)).map(_.getString(0)).toSeq
    assert(byP == byQ, "x ↦ x^α is increasing; order must be preserved")
  }

  test("ccnet buckets: 3 terciles per language, sizes within 1, cutoffs nested") {
    val rows = TextOps.ccnetBuckets(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(0))
    val perLang = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == perLang.keySet, "every language bucketed")
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getString(1)).sorted.toSeq == Seq("head", "middle", "tail"),
        s"$lang buckets")
      // ntile: bucket sizes differ by at most 1 and sum to the doc count
      val sizes = rs.map(_.getLong(2))
      assert(sizes.sum == perLang(lang), s"$lang docs conserved")
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      // per-language score ranges must be disjoint and ordered
      // head ≤ middle ≤ tail (rarity ascending = quality descending)
      val m = rs.map(r => r.getString(1) -> (r.getDouble(3), r.getDouble(4))).toMap
      assert(m("head")._2 <= m("middle")._1 && m("middle")._2 <= m("tail")._1,
        s"$lang cutoffs not nested: $m")
    }
  }

  test("ccnet buckets plan: windows are cell-partitioned or dimension-grained, no ntile") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWin}
    val qe = TextOps.ccnetBuckets(spark, sf).queryExecution
    // the r12 reshape removed the per-language fact-sized ntile window;
    // a reintroduction is a one-reducer sort of a hot language at 100×
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("ntile"),
      "ccnetBuckets must not rank with ntile over a per-document frame")
    val wins = qe.optimizedPlan.collect { case w: LWin => w }
    assert(wins.nonEmpty, "two-level recipe still uses bounded windows")
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      assert(keys.nonEmpty, s"unpartitioned window in ccnetBuckets:\n$w")
      // (lang, cell)-partitioned straddle resolution is cell-bounded;
      // anything else must sit over a GROUPING aggregate (the ≤1024-row
      // per-language cell histogram), never the raw per-document frame
      val cellKeyed = keys.contains("k")
      lazy val overAgg = w.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.nonEmpty => a
      }.isDefined
      assert(cellKeyed || overAgg,
        s"window partitioned by $keys over a raw per-document frame:\n$w")
    }
  }

  test("bm25: three ranked terms per doc, scores non-increasing, length-normalized") {
    val rows = TextOps.bm25(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(Array(1L, 2L, 3L)), s"doc $d ranks")
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $d monotone")
    }
  }

  test("pmi: collocations gated at support 5, strongest first") {
    val rows = TextOps.pmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(_.getLong(1) >= 5), "support gate")
    val pmis = rows.map(_.getDouble(2))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }, "ordered by pmi desc")
  }

  test("kmeans assignment: total, centroids self-assign at distance 0") {
    val rows = graft.operators.VectorOps.kmeansAssign(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == n, "every vector assigned exactly once")
    rows.filter(_.getLong(0) < 8).foreach { r =>
      assert(r.getLong(1) == r.getLong(0) && r.getDouble(2) == 0.0,
        s"centroid ${r.getLong(0)} must be its own nearest at distance 0")
    }
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("sequence packing: contiguous stream per source, correct cut bookkeeping") {
    val rows = TextOps.packSequences(spark, sf, budget = 256).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val ordered = rs.sortBy(_._2)
      // first doc opens the stream
      assert(ordered.head._4 == 0L && ordered.head._5 == 0L, s"$src stream start")
      // contiguity: each doc starts exactly where the previous ended
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val aStart = a._5 * 256 + a._4
          val bStart = b._5 * 256 + b._4
          assert(bStart == aStart + a._3, s"$src: doc ${b._2} not contiguous")
        case _ => ()
      }
      // spans_cut ⇔ the doc crosses a 256 boundary
      ordered.foreach { case (_, id, n, off, _, spans) =>
        assert(spans == (off + n > 256), s"$src doc $id spans_cut")
      }
    }
  }

  test("decayed activity: fold and monoid shapes agree; horizon event counts ~1") {
    import graft.operators.Relational
    val fold = Relational.decayedActivity(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val mono = Relational.decayedActivityMonoid(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(fold.keySet == mono.keySet)
    fold.foreach { case (u, (n, s)) =>
      assert(mono(u)._1 == n)
      assert(math.abs(mono(u)._2 - s) <= 1e-4 + 1e-9 * math.abs(s),
        s"user $u: fold $s vs monoid ${mono(u)._2}")
      // decay weights are in (0, 1]: score bounded by event count, positive
      assert(s > 0.0 && s <= n.toDouble + 1e-9, s"user $u score $s vs n $n")
    }
  }

  test("skyline: window-algebra frontier equals a brute-force Scala dominance check") {
    import org.apache.spark.sql.functions.{to_date, unix_timestamp}
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("event_id"), col("value"), unix_timestamp(col("ts")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3), r.getLong(4)))
    val expected = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, g) =>
      g.filter(e => !g.exists(d =>
        d._4 >= e._4 && d._5 >= e._5 && (d._4 > e._4 || d._5 > e._5))).toSeq
    }.map(e => (e._1, e._2, e._3)).toSet
    val got = graft.operators.Relational.skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(got == expected, s"diff: ${(got -- expected) ++ (expected -- got)}")
  }

  test("edit-distance verify runs only on LSH candidates and is bounded") {
    val rows = TextOps.editSimilarity(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair order d1 < d2")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 40, "distance within gate")
    }
  }

  test("containment: subset arithmetic holds, pairs come from the LSH graph") {
    val sfDir = "/root/testdata/sf0.01"
    val rows = TextOps.containment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val lsh = TextOps.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (d1, d2, sz1, sz2, inter, rel) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      assert(lsh.contains((d1, d2)))
      assert(inter == math.min(sz1, sz2), "containment means inter = smaller set")
      val expect = if (sz1 == sz2) "equal" else if (inter == sz1) "d1_in_d2" else "d2_in_d1"
      assert(rel == expect)
    }
  }

  test("lm score: positive, and exact-duplicate texts score identically") {
    val sfDir = "/root/testdata/sf0.01"
    val scores = TextOps.lmScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.nonEmpty && scores.values.forall(_ > 0))
    // local recomputation with the same token-sorted fold for 3 docs
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val cf = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = cf.values.sum
    val v = cf.size.toLong
    docs.keys.toSeq.sorted.take(3).foreach { id =>
      val tf = docs(id).groupBy(identity).view.mapValues(_.size.toLong).toMap
      var acc = 0.0
      tf.keys.toSeq.sorted.foreach { tok =>
        acc -= tf(tok) * math.log((cf(tok) + 1) / (n + v).toDouble)
      }
      val expect = BigDecimal(acc / docs(id).size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(scores(id) - expect) < 1e-9, s"doc $id: ${scores(id)} vs $expect")
    }
  }

  test("winnow: exact duplicates share fingerprints; output ranked by df") {
    val sfDir = "/root/testdata/sf0.01"
    val rows = TextOps.winnow(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val dfs = rows.map(_.getLong(1))
    assert(dfs.forall(_ >= 2))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b }, "ranked by df desc")
    // a duplicated doc pair must share every fingerprint, so at least one
    // fingerprint in the fixture reaches df >= 2 through that pair alone
    assert(dfs.max >= 2)
  }

  test("minhash estimates are calibrated: bounded, and close to exact Jaccard on average") {
    val sfDir = "/root/testdata/sf0.01"
    val rows = TextOps.minhashEstimate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (jac, est, err) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(jac >= 0.0 && jac <= 1.0 && est >= 0.0 && est <= 1.0)
      assert(math.abs(err - math.abs(jac - est)) < 2e-4, "abs_err inconsistent")
    }
    // 16 permutations: sd of the estimator ≈ sqrt(j(1-j)/16) ≤ 0.125;
    // the MEAN error across ≥20 pairs should sit well inside one sd
    val meanErr = rows.map(_.getDouble(5)).sum / rows.length
    assert(meanErr < 0.125, f"mean |est-jac| $meanErr%.4f too high — sketch mis-calibrated")
  }

  test("repeated grams: values match an independent local recompute") {
    val sfDir = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val occ = scala.collection.mutable.Map.empty[String, (Set[Long], Long)]
      .withDefaultValue((Set.empty, 0L))
    docs.foreach { case (id, toks) =>
      toks.sliding(6).filter(_.size == 6).foreach { g =>
        val k = g.mkString("_")
        val (ids, n) = occ(k)
        occ(k) = (ids + id, n + 1)
      }
    }
    val expect = occ.toSeq
      .collect { case (g, (ids, n)) if ids.size >= 2 => (g, ids.size.toLong, n, ids.min) }
      .sortBy { case (g, df, _, _) => (-df, g) }
      .take(50)
    val got = TextOps.repeatedGrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("winnow: values match an independent local recompute (r6 red row pin)") {
    // The round-6 oracle mismatch was NOT a Spark wrong answer: DuckDB's
    // list_sum yields HUGEINT, which the driver's pandas bridge carried
    // as float64 (11027.0 vs 11027). This pins the Spark values against
    // a from-scratch Scala recompute so any future real divergence is
    // caught locally without the oracle in the loop.
    val sfDir = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    def code(t: String): Long = {
      var acc = 0L; var j = 0; var pos = 0
      while (j < t.length) {
        val cp = t.codePointAt(j); pos += 1
        acc += cp.toLong * pos; j += Character.charCount(cp)
      }
      acc
    }
    // the r11 polynomial rolling hash, via the SINGLE shared test
    // recompute (WinnowRef) every winnow law is proven against
    import WinnowRef.trig
    val perFp = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, toks) =>
      val c = toks.map(code)
      val h = (0 until math.max(c.length - 2, 0))
        .map(i => trig(c(i), c(i + 1), c(i + 2)))
      if (h.length >= 4)
        (0 to h.length - 4).map(i => h.slice(i, i + 4).min).distinct
          .foreach(fp => perFp.getOrElseUpdate(fp, scala.collection.mutable.Set.empty) += id)
    }
    val expect = perFp.toSeq
      .collect { case (fp, ids) if ids.size >= 2 => (fp, ids.size.toLong, ids.min) }
      .sortBy { case (fp, df, _) => (-df, fp) }
      .take(50)
    val got = TextOps.winnow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the pre-r11 c1 + 3*c2 + 9*c3 form collided SYSTEMATICALLY:
    // ("ab","ac",w) and ("ae","ab",w) hashed equal for EVERY w (293 +
    // 3*295 = 299 + 3*293). The polynomial form must separate the class.
    assert(code("ab") + 3 * code("ac") == code("ae") + 3 * code("ab"),
      "premise: the old form's alias pair")
    for (w <- Seq("x", "yz", "the"))
      assert(trig(code("ab"), code("ac"), code(w)) != trig(code("ae"), code("ab"), code(w)),
        s"alias class must not collide under the polynomial hash (w=$w)")
  }

  /** Shared local recompute under the two dup-span tests: per-doc maximal
    * islands of cross-document duplicated 6-gram coverage, gram identity
    * = the raw token tuple (the engine's xxhash64 keys, sans collisions). */
  private def localSpans(sfDir: String)
      : (Map[Long, Seq[String]], Map[Long, Seq[(Long, Long)]]) = {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val docsOf = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
      .withDefaultValue(Set.empty)
    docs.foreach { case (id, toks) =>
      toks.sliding(6).filter(_.size == 6).foreach(g => docsOf(g) += id)
    }
    val spans = docs.map { case (id, toks) =>
      val hits = toks.sliding(6).zipWithIndex
        .collect { case (g, i) if g.size == 6 && (docsOf(g) - id).nonEmpty =>
          (i + 1).toLong }
        .toSeq
      val islands = hits.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, j) if acc.nonEmpty && j <= acc.last._2 - 5 + 6 =>
          acc.init :+ (acc.last._1, j + 5)
        case (acc, j) => acc :+ (j, j + 5)
      }
      id -> islands
    }
    (docs, spans)
  }

  test("dup spans: values match an independent local recompute") {
    val sfDir = "/root/testdata/sf0.01"
    val (_, spans) = localSpans(sfDir)
    val expect = spans.toSeq
      .flatMap { case (id, ss) => ss.map { case (s, e) => (id, s, e, e - s + 1) } }
      .sortBy { case (id, s, _, _) => (id, s) }
    val got = TextOps.dupSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "fixture must exercise the span path")
    // islands are maximal: consecutive spans in one doc have a gap
    got.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, "adjacent spans must have merged")
        case _ =>
      }
    }
  }

  test("dup strip: cleaned text drops exactly the covered tokens") {
    val sfDir = "/root/testdata/sf0.01"
    val (docs, spans) = localSpans(sfDir)
    val expect = docs.toSeq.map { case (id, toks) =>
      val covered = spans(id).flatMap { case (s, e) => s to e }.toSet
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !covered((i + 1).toLong) => t
      }
      (id, toks.size.toLong, toks.size.toLong - kept.size, kept.mkString(" "))
    }.sortBy(_._1)
    val got = TextOps.dupStrip(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expect)
    assert(got.exists(_._3 > 0), "fixture must exercise the strip path")
    assert(got.exists(r => r._3 == 0 && r._4.nonEmpty),
      "untouched docs must pass through verbatim")
  }
}
