package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: largest-remainder allocation and the curation
  * accounting queries — properties the DuckDB oracle can't express
  * (exact-sum invariants, local recomputation). */
class AllocSpec extends SparkSpec {

  test("q_alloc: per-order allocations sum EXACTLY to the order total in cents") {
    val alloc = operators.Relational.allocation(spark, sf)
    val totals = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("t_c"))
    // only orders that have lineitems receive an allocation
    val sums = alloc.groupBy("l_orderkey").agg(sum("alloc_c").as("s"))
      .join(totals, "l_orderkey")
    val n = sums.count()
    assert(n > 0)
    assert(sums.filter(col("s") =!= col("t_c")).count() == 0,
      "largest-remainder allocation must hit the exact total per order")
  }

  test("q_alloc: every allocation is within one cent of the exact proportional share") {
    val alloc = operators.Relational.allocation(spark, sf)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), floor(col("l_quantity")).cast("long").as("qty"))
      .groupBy("l_orderkey").agg(sum("qty").as("q_tot"))
    val totals = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("t_c"))
    val off = alloc.join(li, "l_orderkey").join(totals, "l_orderkey")
      // exact share = t_c·qty/q_tot; base = floor(share) so alloc ∈ {base, base+1}
      .withColumn("lo", expr("(t_c * qty) div q_tot"))
      .filter(col("alloc_c") < col("lo") || col("alloc_c") > col("lo") + 1)
    assert(off.count() == 0, "alloc must be floor(share) or floor(share)+1")
  }

  test("q_class_balance: kept counts match a local recompute of the hash rule") {
    val out = operators.Curation.classBalance(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf).select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    out.foreach { case (t, nTotal, threshold, nKept) =>
      val ids = byType(t).map(_._2)
      assert(nTotal == ids.length)
      assert(threshold == math.min(10000L, (10000L * 2000L) / nTotal))
      val kept = ids.count(id =>
        math.floorMod(operators.Curation.knuthFoldLong(id) * 2654435761L, 10000L) < threshold)
      assert(nKept == kept, s"class $t: engine $nKept vs local $kept")
    }
  }

  test("q_novelty: the first document scores 1.0 and novelty is within [0,1]") {
    val rows = operators.Curation.gramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    // min doc_id present owns every one of its grams by construction
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) == 1.0)
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && novel >= 0 && novel <= n)
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("q_zipf: natural-ish corpus slope is negative and the fit reproduces a local OLS") {
    val row = operators.TextOps.zipfFit(spark, sf).collect().head
    val (nTerms, slope) = (row.getLong(0), row.getDouble(1))
    assert(nTerms > 0)
    assert(slope < 0.0, "frequency must decay with rank")
    // local recompute over the same ranked vocabulary
    val cf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, f) => (-f, t) }
    val xs = cf.indices.map(i => math.log(i + 1.0))
    val ys = cf.map { case (_, f) => math.log(f.toDouble) }
    val n = cf.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val local = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - local) < 1e-3, s"engine $slope vs local $local")
  }

  test("q_simpson: index matches the collision probability of a local token count") {
    val rows = operators.TextOps.simpson(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val (src, simpson) = (r.getString(0), r.getDouble(4))
      val toks = docs.filter(_._1 == src).flatMap(_._2.split(" "))
      val tf = toks.groupBy(identity).map(_._2.length.toLong)
      val nTok = tf.sum
      val pairs = tf.map(c => c * (c - 1)).sum
      val local = BigDecimal(pairs.toDouble / (nTok.toDouble * (nTok - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(simpson - local) <= 1e-6, s"$src: engine $simpson vs local $local")
    }
  }
}
