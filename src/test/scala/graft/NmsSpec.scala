package graft

import graft.operators.{Detection, Nms}
import org.scalacheck.Gen

/** E-NMS correctness: independent reference implementation + algebraic laws
  * (SURVEY §5.3) + distribution invariance. */
class NmsSpec extends SparkSpec {

  /** Deterministic property sampler (no scalatestplus bridge in the
    * offline cache): 200 samples from a fixed seed. */
  def forAllSamples[A](gen: Gen[A], n: Int = 200)(f: A => Boolean): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, seed).foreach(a => assert(f(a), s"failed on sample $i: $a"))
      seed = seed.next
    }
  }

  /** Independent reference: recursive formulation — keep the global-max
    * box, drop overlapping, recurse on the rest. Structurally different
    * from the production sorted-scan, same greedy semantics. */
  def referenceNms(dets: Seq[Detection], t: Double): Seq[Detection] =
    if (dets.isEmpty) Nil
    else {
      val best = dets.minBy(d => (-d.conf, d.det_id))
      val rest = dets.filter(d => d.det_id != best.det_id && Nms.iou(best, d) <= t)
      best +: referenceNms(rest, t)
    }

  val genDet: Gen[Detection] = for {
    id <- Gen.choose(0L, 10000L)
    frame <- Gen.choose(0L, 3L)
    x <- Gen.choose(0, 200); y <- Gen.choose(0, 200)
    w <- Gen.choose(1, 120); h <- Gen.choose(1, 120)
    conf <- Gen.choose(0.0, 1.0)
    cls <- Gen.choose(0, 2)
  } yield Detection(id, frame, x, y, w, h, conf, cls)

  def genFrame: Gen[List[Detection]] = for {
    n <- Gen.choose(0, 40)
    ds <- Gen.listOfN(n, genDet)
  } yield ds.groupBy(_.det_id).map(_._2.head).toList // unique ids

  test("greedy matches independent reference implementation") {
    forAllSamples(genFrame) { dets =>
      Nms.greedy(dets, 0.3).sortBy(_.det_id) == referenceNms(dets, 0.3).sortBy(_.det_id)
    }
  }

  test("idempotence: nms(nms(x)) == nms(x)") {
    forAllSamples(genFrame) { dets =>
      val once = Nms.greedy(dets, 0.3)
      Nms.greedy(once, 0.3).sortBy(_.det_id) == once.sortBy(_.det_id)
    }
  }

  test("kept set is an IoU-independent set; every dropped box blames a stronger kept box") {
    forAllSamples(genFrame) { dets =>
      val kept = Nms.greedy(dets, 0.3)
      val keptOk = kept.forall(a => kept.forall(b =>
        a.det_id == b.det_id || Nms.iou(a, b) <= 0.3))
      val dropped = dets.filterNot(d => kept.exists(_.det_id == d.det_id))
      val droppedOk = dropped.forall(d => kept.exists(k =>
        Nms.iou(k, d) > 0.3 && (k.conf > d.conf || (k.conf == d.conf && k.det_id < d.det_id))))
      keptOk && droppedOk
    }
  }

  test("iou basics") {
    assert(Nms.iou(0, 0, 10, 10, 0, 0, 10, 10) == 1.0)
    assert(Nms.iou(0, 0, 10, 10, 20, 20, 10, 10) == 0.0)
    assert(math.abs(Nms.iou(0, 0, 10, 10, 5, 0, 10, 10) - 50.0 / 150.0) < 1e-12)
    assert(Nms.iou(0, 0, 0, 0, 0, 0, 0, 0) == 0.0) // degenerate → 0, not NaN
  }

  test("distributed nmsPerFrame is partitioning-invariant and matches local greedy") {
    import spark.implicits._
    val dets = (0 until 200).map { i =>
      Detection(i.toLong, i % 5, (i * 17) % 150, (i * 31) % 150,
        40 + i % 3 * 10, 40 + i % 4 * 10, (i * 0.37) % 1.0, 0)
    }
    val expected = dets.groupBy(_.frame_id).toSeq
      .flatMap { case (_, ds) => Nms.greedy(ds, 0.3) }
      .map(_.det_id).sorted
    for (parts <- Seq(1, 3, 7)) {
      val got = Nms.nmsPerFrame(spark.createDataset(dets).repartition(parts), 0.3)
        .collect().map(_.det_id).sorted.toSeq
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("greedy keeps at least as many boxes as dominance suppression drops-to") {
    // dominance can over-suppress (its suppressor may itself be suppressed)
    val greedy = Nms.greedyQuery(spark, sf).count()
    val dom = Nms.dominanceQuery(spark, sf).count()
    assert(greedy >= dom)
    assert(greedy > 0)
  }
}
