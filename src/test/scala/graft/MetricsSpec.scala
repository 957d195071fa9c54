package graft

import graft.model.{Doc, Span, Spec}
import graft.operators.{GazetteerMatcher, SpanOps}
import graft.sources.InterleavedDocs

/** Metrics layer: accumulators + distributed P/R (BASELINE.json:6,14). */
class MetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("matcher accumulators count spans, empties, and mentions") {
    val docs = spark.createDataset(Seq(
      Doc("m1", Seq(Span("text", "the customer", null, 0))),
      Doc("m2", Seq(Span("text", "", null, 0))),
      Doc("m3", Seq(Span("text", "spark spark", null, 0)))))
    val counters = Metrics.matcherCounters(spark)
    val n = GazetteerMatcher.candidates(spark,
      SpanOps.textSpans(SpanOps.explodeSpans(docs)), Spec.Gazetteer,
      Some(counters)).count()
    assert(counters.textSpans.value == 3)
    assert(counters.emptySpans.value == 1)
    assert(counters.mentions.value == 3) // customer + spark ×2
    assert(n == 3)
  }

  test("distributed P/R: 1.0 on self, correct on known perturbations") {
    val t = Pipeline.triples(spark,
      InterleavedDocs.synthesize(spark, 50L, seed = 13L)).cache()
    assert(Metrics.precisionRecall(t, t) == ((1.0, 1.0)))
    val half = t.limit((t.count() / 2).toInt).cache()
    val (p, r) = Metrics.precisionRecall(half, t)
    assert(p == 1.0 && r < 1.0 && r > 0.0)
    val (p2, r2) = Metrics.precisionRecall(t, half)
    assert(r2 == 1.0 && p2 < 1.0)
  }
}
