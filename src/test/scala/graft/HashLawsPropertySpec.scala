package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Property pins for the r11 exact-hash claims, on the FULL 64-bit code
  * domain the fixture can never reach: the oracle audit fixed silent
  * long-wrap divergences (MinHashSig/SimHash16 codes past ~8.2e12,
  * unfolded Knuth ids past ~3.48e9) by folding to [0, p) before the
  * affine multiply — mod distributes, so the folded long arithmetic must
  * equal exact BigInt math EVERYWHERE, including Long.MinValue/MaxValue
  * and negative codes. BigInt is the independent reference (the same
  * role DuckDB's HUGEINT plays for the oracles). */
class HashLawsPropertySpec extends SparkSpec {

  def forAllSamples[A](gen: Gen[A], n: Int = 60)(f: A => Boolean): Unit = {
    var seed = org.scalacheck.rng.Seed(11L)
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, seed).foreach(a => assert(f(a), s"failed on sample $i: $a"))
      seed = seed.next
    }
  }

  private val P = graft.operators.TextOps.MinhashPrime
  private val params = graft.operators.TextOps.MinhashParams

  /** full-range longs; the wrap-triggering extremes are APPENDED to
    * every sample (not merely drawn with some probability — r11 review:
    * Gen.oneOf alone made the 'always included' claim false) */
  private val genCodes: Gen[List[Long]] = for {
    n <- Gen.choose(1, 9)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(8000000000000L, Long.MaxValue))) // past the old a·c wrap point
  } yield cs ++ List(Long.MinValue, Long.MaxValue, 8000000000001L)

  private def bigMod(x: BigInt, m: Long): BigInt = {
    val r = x.mod(BigInt(m)); r // BigInt.mod is the mathematical (non-negative) mod
  }

  test("minhash_sig == exact BigInt affine-mod min for arbitrary 64-bit codes") {
    val schema = StructType(Seq(StructField("codes", ArrayType(LongType, containsNull = false))))
    forAllSamples(genCodes) { cs =>
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(cs.toArray.toSeq)), schema)
      val got = df.select(graft.functions.MinHashSig
          .minhashSig(col("codes"), params, P).as("sig"))
        .head().getSeq[Long](0)
      val want = params.map { case (_, a, b) =>
        cs.map(c => bigMod(BigInt(a) * bigMod(BigInt(c), P) + b, P).toLong).min
      }
      got == want
    }
  }

  test("simhash16 == exact BigInt per-bit vote for arbitrary 64-bit codes") {
    val schema = StructType(Seq(StructField("codes", ArrayType(LongType, containsNull = false))))
    forAllSamples(genCodes) { cs =>
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(cs.toArray.toSeq)), schema)
      val got = df.select(graft.functions.SimHash16
          .simhash16(col("codes"), params, P).as("fp"))
        .head().getLong(0)
      val want = params.map { case (i, a, b) =>
        val s = cs.map { c =>
          (bigMod(BigInt(a) * bigMod(BigInt(c), P) + b, P) % 2).toLong * 2 - 1
        }.sum
        if (s > 0) 1L << i else 0L
      }.sum
      got == want
    }
  }

  test("knuthFold (Column and Long twins) == BigInt mathematical mod on arbitrary ids") {
    import graft.operators.Curation
    val genId = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.const(Long.MinValue), Gen.const(Long.MaxValue), Gen.const(-1L))
    val schema = StructType(Seq(StructField("id", LongType)))
    forAllSamples(Gen.listOfN(8, genId)) { ids =>
      val rows = ids.map(i => Row(i): Row)
      val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      val got = df.select(Curation.knuthFold(col("id")).as("f")).collect().map(_.getLong(0))
      val wantCol = ids.map(i => bigMod(BigInt(i), 2147483647L).toLong)
      val wantLong = ids.map(Curation.knuthFoldLong)
      got.toSeq == wantCol && wantLong == wantCol
    }
  }

  test("winnowing guarantee: any shared run of >= w+k-1 = 6 tokens yields a shared fingerprint") {
    // Schleimer et al. 2003's t = w+k-1 guarantee, on random docs under
    // the r11 polynomial trigram hash. Proven against the SAME pure
    // recompute the engine is pinned to row-for-row in CorpusOpsSpec
    // ("values match an independent local recompute"), so the law
    // transfers to the engine without a Spark job per sample.
    import WinnowRef.fingerprints
    val genCase = for {
      run <- Gen.listOfN(6, Gen.choose(0L, 500000L))            // the shared 6-token run
      pre1 <- Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 500000L)))
      suf1 <- Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 500000L)))
      pre2 <- Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 500000L)))
      suf2 <- Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 500000L)))
    } yield (pre1 ++ run ++ suf1, pre2 ++ run ++ suf2)
    forAllSamples(genCase, n = 80) { case (d1, d2) =>
      (fingerprints(d1) intersect fingerprints(d2)).nonEmpty
    }
  }

  test("TopKAggregator: reduce/merge order never changes the result (shuffle-plan independence)") {
    import graft.functions.{Scored, TopKAggregator}
    val agg = TopKAggregator(5)
    val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))
    val genRows: Gen[List[Scored]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf(Gen.choose(-1e6, 1e6), Gen.oneOf(0.0, 1.0, 1.0)) // tie-rich
        id <- Gen.choose(0L, 20L) // small domain → frequent (score, id) ties
      } yield Scored(s, id))
      } yield rows
    forAllSamples(genRows) { rows =>
      val want = rows.sorted(ord).take(5)
      // single-buffer reduce in input order
      val sequential = rows.foldLeft(agg.zero)(agg.reduce)
      // arbitrary partitionings + merge trees must agree
      // floorMod: .abs is Int.MinValue on Int.MinValue — seed 0 would
      // divide by zero below (r11 review)
      val seed = java.lang.Math.floorMod(rows.hashCode, 7) + 2
      val parts = rows.grouped(math.max(1, rows.size / seed)).toList
      val merged = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val mergedReversed = parts.reverse.map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(sequential) == want &&
        agg.finish(merged) == want &&
        agg.finish(mergedReversed) == want
    }
  }

  test("tempMix rebalancing laws hold on random language distributions") {
    // distributions the 5-language fixture can't produce: up to 40
    // languages, token masses spanning 1 .. 1e12 (extreme skew)
    val genDist: Gen[List[Long]] = for {
      n <- Gen.choose(1, 40)
      ts <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(1L, 1000L), Gen.choose(1L, 1000000000000L)))
    } yield ts
    forAllSamples(genDist, n = 25) { tokens =>
      val rows = tokens.zipWithIndex.map { case (t, i) =>
        Row(f"l$i%02d", 1L, t)
      }
      val schema = StructType(Seq(StructField("lang", StringType),
        StructField("n_docs", LongType), StructField("n_tokens", LongType)))
      val per = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val got = graft.operators.TextOps.tempMixOver(per)
        .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4))).toList
      // independent recompute (q = p^α / Σp^α), compared at the 1e-4
      // display grid the operator rounds to
      val total = tokens.map(BigInt(_)).sum.toDouble
      val want = tokens.zipWithIndex.map { case (t, i) =>
        (f"l$i%02d", t / total, math.pow(t / total, 0.3))
      }
      val z = want.map(_._3).sum
      got.sortBy(_._1).zip(want.sortBy(_._1)).forall { case ((lg, p, q), (lw, pw, qw)) =>
        lg == lw && math.abs(p - pw) < 5e-4 && math.abs(q - qw / z) < 5e-4
      } && {
        // flattening: rebalanced shares are never MORE skewed — the max
        // share can only shrink, the min share can only grow
        val (ps, qs) = (got.map(_._2), got.map(_._3))
        qs.max <= ps.max + 5e-4 && qs.min >= ps.min - 5e-4
      }
    }
  }
}
