package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Sequence/flow analytics: transition-matrix stochasticity, sweep-line
  * peak bounds, attribution causality, and the OLS identity — properties
  * the row-hash oracle can't express. */
class EventFlowSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("transition probabilities are row-stochastic and counts conserve") {
    val rows = Relational.transitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      // rounded 4-dp probabilities: sum within rounding slack of 1
      assert(math.abs(pSum - 1.0) < 5e-4 * rs.length, s"$src: p sums to $pSum")
    }
    // total transitions = total events - one tail event per active user
    val nPairs = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nPairs == expected)
  }

  test("peak concurrency is positive and bounded by the type's event count") {
    val counts = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Relational.peakConcurrency(spark, sfDir).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val (tpe, peak) = (r.getString(0), r.getLong(1))
      assert(peak >= 1 && peak <= counts(tpe), s"$tpe: peak $peak")
    }
  }

  test("wau equals the brute-force trailing-7-day distinct recompute") {
    // the r10 interval-sweep reshape (merged activity runs + boundary
    // deltas) must agree day-for-day with the definition it optimizes:
    // |{u : u active on some day in [d-6, d]}| for every observed day d
    val act = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val expected = act.map(_._1).distinct.sorted.map { d =>
      d -> act.filter { case (a, _) =>
        !a.isAfter(d) && !a.isBefore(d.minusDays(6)) }.map(_._2).distinct.length.toLong
    }.toMap
    val got = Relational.rollingActiveUsers(spark, sfDir).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("attribution: credited click precedes its purchase, same user") {
    val attr = Relational.attribution(spark, sfDir)
    val rows = attr.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0, s"negative latency: $r"))
    // every credited click_id is a real click event of the same user
    val bad = attr.join(
        Tables.events(spark, sfDir).select(col("event_id").as("click_id"),
          col("user_id").as("cu"), col("event_type").as("ct")),
        "click_id")
      .filter(col("ct") =!= "click" || col("cu") =!= col("user_id"))
      .count()
    assert(bad == 0)
  }

  test("rfm: quintile scores balanced, segment rules hold") {
    val rows = Relational.rfm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    Seq(4, 5, 6).foreach { i => // r/f/m score columns
      val sizes = rows.groupBy(_.getLong(i)).view.mapValues(_.length)
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      // ntile splits |bucket| into floor/ceil of n/5
      sizes.values.foreach(s => assert(s == n / 5 || s == n / 5 + 1))
    }
    rows.foreach { r =>
      val (rs, fs, seg) = (r.getLong(4), r.getLong(5), r.getString(7))
      val expect =
        if (rs >= 4 && fs >= 4) "champion"
        else if (rs <= 2 && fs >= 4) "at_risk"
        else if (fs <= 2 && rs >= 4) "new"
        else "regular"
      assert(seg == expect, s"user ${r.getLong(0)}: $seg vs $expect")
    }
  }

  test("signatures: sorted parts, user counts conserve") {
    val rows = Relational.behaviorSignatures(spark, sfDir).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val parts = r.getString(0).split(">").toSeq
      assert(parts == parts.sorted && parts.distinct == parts)
    }
    val total = rows.map(_.getLong(1)).sum
    val users = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) <= lit("2024-01-03").cast("date"))
      .select("user_id").distinct().count()
    assert(total == users)
  }

  test("benford: digits 1-9, shares sum to ~1") {
    val rows = Relational.benfordDigits(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(('1' to '9').map(_.toString).toSet))
    val sum = rows.map(_.getDouble(2)).sum
    assert(math.abs(sum - 1.0) < 5e-4 * rows.length)
  }

  test("full outer join keeps either-side rows; statuses match the counts") {
    val rows = Relational.joinFullOuter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var clicksOnly = 0; var errorsOnly = 0
    rows.foreach { r =>
      val (c, e, s) = (r.getLong(2), r.getLong(3), r.getString(4))
      assert(c > 0 || e > 0, "a (0,0) row survived the outer join")
      val expect = if (c > 0 && e > 0) "both"
                   else if (c > 0) "clicks_only" else "errors_only"
      assert(s == expect)
      if (s == "clicks_only") clicksOnly += 1
      if (s == "errors_only") errorsOnly += 1
    }
    // genuinely outer: both unmatched directions occur in the fixture
    assert(clicksOnly > 0 && errorsOnly > 0)
  }

  test("abandonment agrees with a brute-force check of the raw events") {
    val byUser = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime))
      .groupBy(_._1)
    val expected = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val dayFmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    dayFmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    for ((_, evs) <- byUser; (_, eid, tpe, t) <- evs if tpe == "click") {
      val converted = evs.exists { case (_, pid, ptpe, pt) =>
        ptpe == "purchase" && (pt > t || (pt == t && pid > eid)) &&
          pt <= t + 3600 * 1000L
      }
      val day = dayFmt.format(new java.util.Date(t))
      val (n, a) = expected.getOrElse(day, (0L, 0L))
      expected(day) = (n + 1, if (converted) a else a + 1)
    }
    Relational.cartAbandonment(spark, sfDir).collect().foreach { r =>
      assert(expected(r.getString(0)) == ((r.getLong(1), r.getLong(2))),
        s"day ${r.getString(0)}")
    }
  }

  test("shares sum to ~1 per day; top-other conserves users and events") {
    val shares = Relational.shareOfDay(spark, sfDir).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(3)).sum)
    assert(shares.nonEmpty)
    shares.foreach { case (day, s) => assert(math.abs(s - 1.0) < 5e-4 * 5, s"$day: $s") }

    val rows = Relational.topNOther(spark, sfDir).collect()
    val byDay = rows.groupBy(_.getString(0))
    val totalUsers = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .groupBy("d").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    byDay.foreach { case (day, rs) =>
      val named = rs.filter(_.getString(1) != "other")
      assert(named.length <= 3)
      named.foreach(r => assert(r.getLong(3) == 1L, "a named bucket holds one user"))
      assert(rs.map(_.getLong(3)).sum == totalUsers(day), s"$day user conservation")
    }
  }

  test("trend slope/intercept match a local OLS over the same points") {
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("x"),
        floor(col("value") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val local = pts.groupBy(_._1).map { case (t, ps) =>
      val n = ps.length.toLong
      val (sx, sy) = (ps.map(_._2).sum, ps.map(_._3).sum)
      val (sxy, sxx) = (ps.map(p => p._2 * p._3).sum, ps.map(p => p._2 * p._2).sum)
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
      t -> slope
    }
    Relational.linearTrend(spark, sfDir).collect().foreach { r =>
      val expect = BigDecimal(local(r.getString(0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"${r.getString(0)}: ${r.getDouble(2)} vs $expect")
    }
  }
}
