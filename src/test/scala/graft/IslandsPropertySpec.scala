package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property pins for the order-dependent algebra the oracle checks only
  * on fixture data: gaps-and-islands vs a brute-force interval merge,
  * and BitmapDistinct vs a Set, on random inputs. */
class IslandsPropertySpec extends SparkSpec {

  def forAllSamples[A](gen: Gen[A], n: Int = 40)(f: A => Boolean): Unit = {
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, seed).foreach(a => assert(f(a), s"failed on sample $i: $a"))
      seed = seed.next
    }
  }

  /** Independent reference: sort seconds, walk once, merge on gap ≤ 1800. */
  private def mergeRef(secs: Seq[Long]): (Long, Long, Long) = {
    val sorted = secs.sorted
    var islands = List.empty[(Long, Long)] // (start, end)
    for (s <- sorted) islands match {
      case (st, en) :: rest if s - (en - 1800) <= 1800 =>
        islands = (st, math.max(en, s + 1800)) :: rest
      case _ => islands = (s, s + 1800) :: islands
    }
    val spans = islands.map { case (st, en) => en - st }
    (islands.size.toLong, spans.sum, spans.max)
  }

  private val genSecs: Gen[List[Long]] = for {
    n <- Gen.choose(1, 30)
    secs <- Gen.listOfN(n, Gen.choose(0L, 100000L))
  } yield secs

  test("islands windows agree with a brute-force interval merge on random streams") {
    import spark.implicits._
    forAllSamples(genSecs) { secs =>
      val df = secs.zipWithIndex
        .map { case (s, i) => (1L, i.toLong, new java.sql.Timestamp(s * 1000L)) }
        .toDF("user_id", "event_id", "ts")
      // same windows as Relational.activityIslands, over this frame
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("s", "event_id")
      val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val got = df
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("s"))
        .withColumn("new_island",
          when(lag("s", 1).over(w).isNull || col("s") - lag("s", 1).over(w) > 1800, 1L)
            .otherwise(0L))
        .withColumn("island_id", sum("new_island").over(run))
        .groupBy("user_id", "island_id")
        .agg(min("s").as("st"), (max("s") + 1800).as("en"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("en") - col("st")).as("cov"),
          max(col("en") - col("st")).as("lng"))
        .collect().head
      val expect = mergeRef(secs.map(_.toLong))
      (got.getLong(1), got.getLong(2), got.getLong(3)) == expect
    }
  }

  test("BitmapDistinct equals Set cardinality on random id multisets") {
    import spark.implicits._
    val bd = udaf(graft.functions.BitmapDistinct(1 << 12),
      org.apache.spark.sql.Encoders.scalaLong)
    val genIds: Gen[List[Long]] = for {
      n <- Gen.choose(1, 200)
      ids <- Gen.listOfN(n, Gen.choose(0L, 4000L))
    } yield ids
    forAllSamples(genIds, n = 15) { ids =>
      val got = ids.toDF("id").agg(bd(col("id"))).collect().head.getLong(0)
      got == ids.toSet.size.toLong
    }
  }

  test("BitmapDistinct skips null keys via the sentinel, matching count(DISTINCT)") {
    import spark.implicits._
    val bd = udaf(graft.functions.BitmapDistinct(1 << 12),
      org.apache.spark.sql.Encoders.scalaLong)
    val df = Seq(Some(1L), Some(2L), None, Some(2L), None).toDF("id")
    val got = df.agg(
      bd(coalesce(col("id"), lit(graft.functions.BitmapDistinct.NullSentinel))).as("b"),
      countDistinct(col("id")).as("cd")).head()
    assert(got.getLong(0) == 2L && got.getLong(0) == got.getLong(1))
    // a genuinely out-of-domain id still fails fast (sentinel is the ONLY pass)
    val e = intercept[Exception] {
      Seq(-5L).toDF("id").agg(bd(col("id"))).collect()
    }
    assert(e.getMessage.contains("bitmap domain")
      || Option(e.getCause).exists(_.getMessage.contains("bitmap domain")))
  }
}
