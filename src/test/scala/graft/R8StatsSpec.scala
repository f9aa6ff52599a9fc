package graft

import graft.operators.{Analytics, Curation, TextOps}
import org.apache.spark.sql.functions._

/** Round-8 statistics/curation batch: each query is pinned by a local
  * from-scratch recompute (the winnow-pin pattern) or a closed-form
  * invariant of the statistic — properties the value-hash oracle can't
  * see, like monotonicity, determinism, and fixpoint equivalence. */
class R8StatsSpec extends SparkSpec {

  test("spearman matches a local rank recompute") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nc"))
      .as[(java.sql.Date, Long, Long)].collect().sortBy(_._1.toString)
    def ranks(key: ((java.sql.Date, Long, Long)) => (Long, String)): Map[String, Int] =
      daily.sortBy(key).zipWithIndex.map { case (r, i) => r._1.toString -> (i + 1) }.toMap
    val rv = ranks(r => (r._2, r._1.toString))
    val rc = ranks(r => (r._3, r._1.toString))
    val n = daily.length.toLong
    val sumD2 = daily.map { r =>
      val d = rv(r._1.toString).toLong - rc(r._1.toString); d * d
    }.sum
    val rho = BigDecimal(1.0 - 6.0 * sumD2 / (n.toDouble * (n.toDouble * n - 1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Analytics.spearman(spark, sf).as[(Long, Long, Double)].head()
    assert(got._1 == n && got._2 == sumD2)
    assert(math.abs(got._3 - rho) < 1e-9)
    assert(got._3 >= -1.0 && got._3 <= 1.0)
  }

  test("theilSen slope matches the local median of pairwise slopes") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("t"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) / 2.0
      val (lo, hi) = (s(math.floor(h).toInt), s(math.ceil(h).toInt))
      lo + (hi - lo) * (h - math.floor(h))
    }
    val got = Analytics.theilSen(spark, sf)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    daily.foreach { case (et, rows) =>
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1).toDouble
      val m = median(slopes.toArray)
      assert(got(et)._2 == slopes.length, s"$et pair count")
      assert(math.abs(got(et)._3 - BigDecimal(m).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$et slope")
    }
  }

  test("kaplanMeier survival starts at 1 - d1/n1, stays in (0, 1], never increases") {
    import spark.implicits._
    val rows = Analytics.kaplanMeier(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val first = rows.head
    val expectFirst = BigDecimal(
      (first._2 - first._3).toDouble / first._2.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(first._4 - expectFirst) < 1e-9)
    rows.foreach { r => assert(r._4 >= 0.0 && r._4 <= 1.0) }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 <= a._4 + 1e-12, s"survival increased at t=${b._1}")
        assert(b._2 < a._2, s"at-risk should shrink at t=${b._1}")
      case _ =>
    }
  }

  test("bootstrapCi brackets its own mean, is deterministic, and spreads") {
    import spark.implicits._
    val run1 = Analytics.bootstrapCi(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    val run2 = Analytics.bootstrapCi(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(run1 == run2, "hash resampler must be bit-deterministic")
    val (_, nBoot, mean, lo, hi) = run1
    assert(nBoot == 200L)
    assert(lo <= mean && mean <= hi)
    assert(hi > lo, "CI must not collapse to a point (affine-bijection trap)")
  }

  test("holt level/trend match a local fold of the daily series") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (et, rs) => et -> rs.sortBy(_._2) }
    val got = Analytics.holt(spark, sf)
      .as[(String, String, Double, Double, Double)].collect()
      .groupBy(_._1).map { case (et, rs) => et -> rs.sortBy(_._2) }
    daily.foreach { case (et, rs) =>
      var l = rs.head._3.toDouble
      var b = 0.0
      rs.zipWithIndex.foreach { case ((_, day, cents), i) =>
        if (i > 0) {
          val lNew = 0.3 * cents + 0.7 * (l + b)
          b = 0.1 * (lNew - l) + 0.9 * b
          l = lNew
        }
        val g = got(et)(i)
        def r6(x: Double) =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(g._2 == day && math.abs(g._3 - r6(l)) < 1e-9
          && math.abs(g._4 - r6(b)) < 1e-9, s"$et $day")
        assert(math.abs(g._5 - r6(l + b)) < 1e-9, s"$et $day forecast")
      }
    }
  }

  test("chunkDedup: retention arithmetic holds and kept chunks = distinct chunks") {
    import spark.implicits._
    val rows = TextOps.chunkDedup(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    rows.foreach { case (_, nChunks, nDropped, kept, frac) =>
      assert(nDropped >= 0 && nDropped <= nChunks)
      assert(kept == 10 * (nChunks - nDropped))
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // corpus-wide: every distinct chunk text is kept exactly once
    val keptTotal = rows.map(r => r._2 - r._3).sum
    val distinctChunks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 10)
      .select(explode(transform(
        sequence(lit(0), floor(size(col("toks")) / 10).cast("int") - 1),
        k => array_join(slice(col("toks"), k * 10 + 1, lit(10)), " "))).as("c"))
      .distinct().count()
    assert(keptTotal == distinctChunks)
  }

  test("kcore equals a local peel-to-fixpoint; fixture is stable by round 3 (oracle depth)") {
    import spark.implicits._
    val pairs = TextOps.minhashPairs(spark, sf).as[(Long, Long)].collect()
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    var localRounds = 0
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      if (changed) localRounds += 1
      edges = next
    }
    val expect = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val got = TextOps.kcore(spark, sf).as[(Long, Long)].collect().toMap
    assert(got == expect)
    // the DuckDB oracle unrolls exactly three peel CTEs — the fixture
    // graph must stay within that depth or the oracle needs re-deepening
    assert(localRounds <= 3,
      s"fixture needs $localRounds peel rounds; q_kcore oracle unrolls 3")
  }

  test("kcorePeel converges on a chain needing more rounds than the old fixed-3 cap") {
    import spark.implicits._
    // path 1-2-…-10 (peels one endpoint pair per round: 5 modifying
    // rounds) + a triangle (every node degree 2: survives forever)
    val path = (1L until 10L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val und = path ++ tri
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
      .localCheckpoint(true)
    val (survived, rounds) = TextOps.kcorePeelWithRounds(edges)
    val got = survived.as[(Long, Long)].collect().toSet
    assert(got == (tri ++ tri.map(_.swap)).toSet,
      s"only the triangle must survive, got $got")
    assert(rounds == 5, s"P10 peels in 5 modifying rounds, got $rounds")
    // the cap guards the pathological chain but must never be silent OR
    // alter results below it: capped at 2, the chain's middle remains
    val (capped, cr) = TextOps.kcorePeelWithRounds(edges, maxRounds = 2)
    assert(cr == 2 && capped.count() > 6,
      "capped peel should stop early with chain remnants present")
  }

  test("markovStationary matches a local matrix power iteration") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    val tot = pairs.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val states = tot.keys.toSeq.sorted
    var pi = states.map(_ -> 1.0 / states.length).toMap
    for (_ <- 1 to 5) {
      pi = states.map { j =>
        val terms = pairs.filter(_._2 == j)
          .map(p => (p._1, pi(p._1) * p._3 / tot(p._1))).sortBy(_._1)
        j -> terms.map(_._2).sum
      }.toMap
    }
    val got = operators.Relational.markovStationary(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.map(_._1).toSeq == states)
    got.foreach { case (s, nOut, p) =>
      assert(nOut == tot(s))
      val e = BigDecimal(pi(s)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(p - e) < 1e-9, s"$s: got $p expect $e")
    }
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-6, "pi must stay a distribution")
  }

  test("sourceOverlap matches local vocabulary set arithmetic") {
    import spark.implicits._
    val vocab = Tables.documents(spark, sf)
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).toSet }
    val got = operators.TextOps.sourceOverlap(spark, sf)
      .as[(String, String, Long, Long, Double)].collect()
    got.foreach { case (s1, s2, inter, uni, j) =>
      val (a, b) = (vocab(s1), vocab(s2))
      assert(inter == (a & b).size.toLong && uni == (a | b).size.toLong)
      val e = BigDecimal(inter.toDouble / uni)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - e) < 1e-9)
    }
    val expectPairs = vocab.keys.toSeq.combinations(2)
      .map(_.sorted).filter(p => (vocab(p(0)) & vocab(p(1))).nonEmpty).size
    assert(got.length == expectPairs)
  }

  test("dedupCurve is monotone non-increasing in tau") {
    import spark.implicits._
    val rows = operators.TextOps.dedupCurve(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(5L, 6L, 7L, 8L, 9L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, s"pairs rose from tau ${a._1} to ${b._1}")
        assert(b._3 <= a._3, s"docs rose from tau ${a._1} to ${b._1}")
      case _ =>
    }
  }

  test("evalMetrics matches a local confusion recompute; kappa ≤ accuracy") {
    import spark.implicits._
    val preds = operators.TextOps.langId(spark, sf)
      .as[(Long, String, Boolean)].collect()
    val langs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val conf = preds.map(p => (langs(p._1), p._2))
    val classes = conf.map(_._1).distinct.sorted
    val got = operators.TextOps.evalMetrics(spark, sf)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == classes.toSet)
    classes.foreach { c =>
      val tp = conf.count(x => x._1 == c && x._2 == c).toLong
      val act = conf.count(_._1 == c).toLong
      val prd = conf.count(_._2 == c).toLong
      val g = got(c)
      assert((g._2, g._3, g._4) == ((tp, act, prd)), s"counts for $c")
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(g._7 == r4(2.0 * tp / (act + prd)), s"f1 for $c")
    }
    val kap = operators.TextOps.cohenKappa(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    val po = kap._2.toDouble / kap._1
    assert(kap._5 <= po + 1e-9, "kappa must not exceed raw accuracy")
    assert(kap._1 == conf.length)
  }

  test("dsirAuc matches a local rank-sum AUC and lands in [0, 1]") {
    import spark.implicits._
    val scored = operators.Curation.dsirScore(spark, sf)
      .as[(Long, String, Long, Double)].collect()
    val pos = scored.filter(_._2 == "en").map(_._4)
    val neg = scored.filter(_._2 != "en").map(_._4)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expect = BigDecimal(num / (pos.length.toLong * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = operators.Curation.dsirAuc(spark, sf)
      .as[(Long, Long, Double)].head()
    assert(got._1 == pos.length && got._2 == neg.length)
    assert(math.abs(got._3 - expect) < 1e-9, s"got ${got._3} expect $expect")
    assert(got._3 >= 0.0 && got._3 <= 1.0)
  }

  test("stlDecompose reconstructs: trend + seasonal + remainder = cents") {
    import spark.implicits._
    val rows = operators.Analytics.stlDecompose(spark, sf)
      .as[(java.sql.Date, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, cents, tr, se, re) =>
      // components are each rounded to 4dp, so the identity holds to ~2e-4
      assert(math.abs(tr + se + re - cents) < 5e-4, s"$d reconstruction")
    }
  }

  test("dsirScore: target-language docs score higher on average") {
    import spark.implicits._
    val rows = Curation.dsirScore(spark, sf)
      .as[(Long, String, Long, Double)].collect()
    val (en, rest) = rows.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val avg = (xs: Array[(Long, String, Long, Double)]) =>
      xs.map(_._4).sum / xs.length
    assert(avg(en) > avg(rest),
      s"en avg ${avg(en)} should exceed non-en avg ${avg(rest)}")
  }

  test("single-day events: the stats family degrades, never ANSI-aborts") {
    import spark.implicits._
    // all events on ONE day: every x is identical, so OLS/variance
    // denominators are exactly 0 — the class of input that crashed
    // q_trend in round 8 (DIVIDE_BY_ZERO job abort under ANSI)
    val dir = java.nio.file.Files.createTempDirectory("graft_degenerate")
      .toFile.getPath
    val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    Seq(
      (1L, ts, 10L, "click", 1.25, """{"k":1}"""),
      (2L, ts, 11L, "view", 2.50, """{"k":2}"""),
      (3L, ts, 10L, "click", 0.75, """{"k":3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val trend = operators.Relational.linearTrend(spark, dir).collect()
    assert(trend.length == 2)
    assert(trend.forall(_.isNullAt(2)), "degenerate slope must be NULL")
    // the rest of the family must complete (empty or guarded output is
    // fine; a thrown SparkArithmeticException is not)
    operators.Analytics.autocorr(spark, dir).collect()
    operators.Analytics.runsTest(spark, dir).collect()
    operators.Analytics.mannKendall(spark, dir).collect()
    operators.Analytics.seasonality(spark, dir).collect()
    operators.Analytics.spearman(spark, dir).collect()
    operators.Analytics.theilSen(spark, dir).collect()
    operators.Analytics.stlDecompose(spark, dir).collect()
    operators.Analytics.holt(spark, dir).collect()
  }
}
