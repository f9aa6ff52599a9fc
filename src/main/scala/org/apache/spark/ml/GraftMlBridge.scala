package org.apache.spark.ml

import org.apache.spark.ml.util.HasTrainingSummary

/** MLlib access bridge (the `GraftBridge` pattern, here for the ml
  * package's `private[spark]` surface).
  *
  * Why it exists: a fitted model's training summary pins the
  * `SparkSession` it was trained on (e.g.
  * `BinaryLogisticRegressionSummaryImpl.sparkSession`, a non-transient
  * field). The model's prediction UDF captures the model — summary and
  * all — so task serialization drags the session into the closure. That
  * works only while every lazily-initialized session field happens to be
  * serializable; the first feature that initializes a non-serializable
  * one (e.g. the `Observation` API's `ObservationManager`) breaks every
  * subsequent `model.transform` with "Task not serializable". A SERVING
  * model must not reference its training session, so the summary is
  * dropped once fitting is done — the same state a persisted-and-reloaded
  * model is in (summaries are not written by MLWriter). */
object GraftMlBridge {

  /** Drop training summaries from every stage of a fitted PipelineModel
    * (in place; returns the same model for chaining). */
  def stripTrainingSummaries(model: PipelineModel): PipelineModel = {
    model.stages.foreach {
      case h: HasTrainingSummary[_] => h.setSummary(None)
      case _ => ()
    }
    model
  }
}
