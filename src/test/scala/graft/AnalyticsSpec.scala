package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Distribution-shape analytics: each query is pinned by an independent
  * local recompute (the winnow-pin pattern — no oracle in the loop) or a
  * closed-form invariant of the statistic itself. */
class AnalyticsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("gini matches a from-scratch local recompute and stays in [0, 1)") {
    import spark.implicits._
    val got = Analytics.gini(spark, sfDir)
      .as[(String, Long, Double)].collect()
      .map { case (r, n, g) => r -> (n, g) }.toMap

    // local recompute: per-customer cents -> region -> ascending rank sum
    val spend = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      .as[(Long, Long)].collect().toMap
    val geo = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
      .as[(Long, String)].collect()
    val byRegion = geo.flatMap { case (ck, r) => spend.get(ck).map(c => (r, ck, c)) }
      .groupBy(_._1)
    val expect = byRegion.map { case (r, rows) =>
      val xs = rows.sortBy(t => (t._3, t._2)).map(_._3.toDouble)
      val n = xs.length
      val s = xs.sum
      val w = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      r -> (n.toLong,
        BigDecimal((2 * w - (n + 1) * s) / (n * s))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (r, (n, g)) =>
      assert(got(r)._1 == n, s"region $r customer count")
      assert(math.abs(got(r)._2 - g) < 1e-9, s"region $r: got ${got(r)._2}, expect $g")
      assert(g >= 0.0 && g < 1.0, s"gini out of range for $r: $g")
    }
  }

  test("hhi is bounded by [1/n_types, 1] and the even/concentrated extremes behave") {
    import spark.implicits._
    val rows = Analytics.hhi(spark, sfDir).as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (day, n, h) =>
      assert(h >= 1.0 / n - 1e-9 && h <= 1.0 + 1e-9, s"$day: hhi $h outside [1/$n, 1]")
    }
  }

  test("pareto: the reported user count is the MINIMAL 80% cover") {
    import spark.implicits._
    val got = Analytics.pareto(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, n, k, s) => t -> (n, k, s) }.toMap
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    perUser.foreach { case (t, rows) =>
      val vs = rows.sortBy(r => (-r._3, r._2)).map(_._3)
      val tot = vs.map(BigInt(_)).sum
      val (n, k, share) = got(t)
      assert(n == vs.length)
      val cumK = vs.take(k.toInt).map(BigInt(_)).sum
      assert(cumK * 5 >= tot * 4, s"$t: top-$k covers < 80%")
      if (k > 1) {
        val cumK1 = vs.take(k.toInt - 1).map(BigInt(_)).sum
        assert(cumK1 * 5 < tot * 4, s"$t: top-${k - 1} already covers 80% — $k not minimal")
      }
      assert(math.abs(share - k.toDouble / n) < 1e-4)
    }
  }

  test("autocorr values are correlations (|r| <= 1) with enough pairs") {
    import spark.implicits._
    val rows = Analytics.autocorr(spark, sfDir).as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, r) =>
      assert(n >= 2, s"$t: too few day pairs ($n)")
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"$t: r=$r out of range")
    }
  }

  test("xcorr matches a from-scratch local recompute") {
    import spark.implicits._
    val got = Analytics.xcorr(spark, sfDir)
      .as[(String, Long, Double)].collect()
      .map { case (f, n, r) => f -> (n, r) }.toMap
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    pts.foreach { case (flag, rows) =>
      val xs = rows.map(r => BigInt(r._2)); val ys = rows.map(r => BigInt(r._3))
      val n = BigInt(rows.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val num = (n * sxy - sx * sy).toDouble
      val den = math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)
      val expect = BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(flag)._1 == rows.length)
      assert(math.abs(got(flag)._2 - expect) < 1e-9, s"$flag: ${got(flag)._2} vs $expect")
    }
  }

  test("gap_stats: quantiles are ordered and bounded by the max") {
    import spark.implicits._
    val rows = Analytics.gapStats(spark, sfDir)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, p50, p90, mx) =>
      assert(n > 0 && p50 >= 0 && p50 <= p90 && p90 <= mx,
        s"$t: n=$n p50=$p50 p90=$p90 max=$mx out of order")
    }
  }

  test("ema matches the recurrence computed locally, in order") {
    import spark.implicits._
    val got = Analytics.ema(spark, sfDir)
      .as[(String, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got.keySet == daily.keySet)
    daily.foreach { case (t, xs) =>
      var e = xs.head.toDouble
      val expect = xs.zipWithIndex.map { case (x, i) =>
        if (i > 0) e = 0.3d * x + 0.7d * e
        BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(got(t) == expect, s"$t ema series mismatch")
    }
  }

  test("key_skew: counts are consistent and the ratio is max/mean") {
    import spark.implicits._
    val r = Analytics.keySkew(spark, sfDir)
      .as[(Long, Long, Double, Double, Long, Double)].head()
    val (nKeys, nRows, p50, p99, mx, ratio) = r
    assert(nKeys > 0 && nRows >= nKeys && p50 <= p99 && p99 <= mx)
    val expect = BigDecimal(mx.toDouble * nKeys / nRows)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(ratio - expect) < 1e-9)
  }

  test("lateral top-2 equals the window-rank formulation") {
    import spark.implicits._
    val lat = graft.operators.Relational.lateralTopOrders(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2 && col("o_custkey") <= 100)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(lat == win)
  }

  test("moments match a local recompute over exact power sums") {
    import spark.implicits._
    val got = Analytics.moments(spark, sfDir)
      .as[(String, Long, Double, Double)].collect()
      .map { case (f, n, sk, ku) => f -> (n, sk, ku) }.toMap
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), floor(col("l_quantity") * 100).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    pts.foreach { case (flag, rows) =>
      val xs = rows.map(r => BigInt(r._2))
      val nd = xs.length.toDouble
      val s1 = xs.sum.toDouble
      val s2 = xs.map(x => x * x).sum.toDouble
      val s3 = xs.map(x => x * x * x).sum.toDouble
      val s4 = xs.map(x => x * x * x * x).sum.toDouble
      val m2 = (nd * s2 - s1 * s1) / (nd * nd)
      val m3 = (nd * nd * s3 - 3.0 * nd * s1 * s2 + 2.0 * s1 * s1 * s1) / (nd * nd * nd)
      val m4 = (nd * nd * nd * s4 - 4.0 * nd * nd * s1 * s3 +
        6.0 * nd * s1 * s1 * s2 - 3.0 * s1 * s1 * s1 * s1) / (nd * nd * nd * nd)
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (n, sk, ku) = got(flag)
      assert(n == xs.length)
      assert(math.abs(sk - r6(m3 / (math.sqrt(m2) * m2))) < 1e-9, s"$flag skewness")
      assert(math.abs(ku - r6(m4 / (m2 * m2) - 3.0)) < 1e-9, s"$flag kurtosis")
    }
  }

  test("calendar: contiguous spine with consistent attributes") {
    import spark.implicits._
    val rows = Analytics.calendar(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length == 182) // Jan 1 .. Jun 30, 2024 (leap year)
    assert(rows.head._1 == "2024-01-01" && rows.last._1 == "2024-06-30")
    rows.foreach { case (d, dow, _, m, q, we) =>
      val ld = java.time.LocalDate.parse(d)
      assert(dow == ld.getDayOfWeek.getValue % 7, s"$d dow")
      assert(m == ld.getMonthValue && q == (ld.getMonthValue + 2) / 3)
      assert(we == (dow == 0 || dow == 6), s"$d weekend flag")
    }
  }

  test("seasonality: 7 rows, shares sum to ~1, index averages ~1") {
    import spark.implicits._
    val rows = Analytics.seasonality(spark, sfDir)
      .select("dow", "rev_share", "rev_index")
      .as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (0L to 6L))
    val shareSum = rows.map(_._2).sum
    assert(math.abs(shareSum - 1.0) < 0.01, s"shares sum to $shareSum")
    rows.foreach { case (d, s, i) =>
      assert(math.abs(i - 7 * s) < 0.005, s"dow $d: index $i vs 7*share ${7 * s}")
    }
  }

  test("series_match: nearest z-normalized window ≡ brute-force recompute") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      .as[(String, String, Long)].collect()
    // 7-day windows per type in day order, constant windows dropped
    val wins = daily.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val ord = rows.sortBy(_._2)
      ord.indices.dropRight(6).map { i =>
        val w = ord.slice(i, i + 7)
        (tpe, w.head._2, w.map(_._3).toVector)
      }
    }.filter { case (_, _, a) => a.distinct.size > 1 }
    def stats(a: Vector[Long]) =
      (a.map(BigInt(_)).sum, a.map(x => BigInt(x) * x).sum)
    def r(a: Vector[Long], b: Vector[Long]): Double = {
      val (sa, ssa) = stats(a); val (sb, ssb) = stats(b)
      val sxy = a.zip(b).map { case (x, y) => BigInt(x) * y }.sum
      val num = 7 * sxy - sa * sb
      num.toDouble /
        (math.sqrt((7 * ssa - sa * sa).toDouble) *
          math.sqrt((7 * ssb - sb * sb).toDouble))
    }
    val q = wins.filter(_._1 == "purchase")
    val c = wins.filter(_._1 != "purchase")
    val expected = q.map { case (_, qd, qa) =>
      // same ranking key as the engine: r on the 1e-8 grid desc, then
      // (type, day) ascending
      val best = c.map { case (mt, md, ma) => (r(qa, ma), mt, md) }
        .sortBy { case (rv, mt, md) =>
          (-BigDecimal(rv).setScale(8, BigDecimal.RoundingMode.HALF_UP), mt, md)
        }.head
      (qd, best._2, best._3,
        BigDecimal(best._1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = Analytics.seriesMatch(spark, sfDir)
      .as[(String, String, String, Double)].collect().toSeq
    assert(got == expected, s"got=${got.take(3)} expected=${expected.take(3)}")
    assert(got.map(_._2).distinct.size > 1 || got.size < 2,
      "every window matched the same candidate type — suspicious")
  }
}
