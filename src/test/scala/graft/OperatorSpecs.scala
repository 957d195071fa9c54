package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.operators._
import graft.sources.InterleavedDocs

/** Unit goldens for the Aho–Corasick matcher + overlap resolution (M2/M3). */
class MatcherSpec extends SparkTestBase {

  private val gaz = Spec.Gazetteer

  private def matchDoc(text: String): Seq[(Int, Int, String, String)] = {
    import spark.implicits._
    val docs = spark.createDataset(Seq(Doc("d1", Seq(Span("text", text, null, 0)))))
    GazetteerMatcher.candidates(spark,
        SpanOps.textSpans(SpanOps.explodeSpans(docs)), gaz)
      .collect()
      .map(c => (c.begin, c.end, c.surface, c.entity_id))
      .sortBy(m => (m._1, m._4)).toSeq
  }

  test("single-token match with char offsets") {
    assert(matchDoc("the customer is here") ===
      Seq((4, 12, "customer", "E_customer")))
  }

  test("multi-token beats overlapping single tokens (longest match)") {
    assert(matchDoc("a sort merge b") ===
      Seq((2, 12, "sort merge", "E_sortmerge")))
  }

  test("adjacent matches both kept when non-overlapping") {
    assert(matchDoc("sort merge hash join") ===
      Seq((0, 10, "sort merge", "E_sortmerge"),
        (11, 20, "hash join", "E_hashjoin")))
  }

  test("ambiguous surface keeps all candidate entities until top-1") {
    assert(matchDoc("data") ===
      Seq((0, 4, "data", "E_data_a"), (0, 4, "data", "E_data_b")))
  }

  test("no substring matches inside longer tokens (token-aligned)") {
    assert(matchDoc("parts sorting departure") === Seq.empty)
  }

  test("case-insensitive matching, offsets on original text") {
    assert(matchDoc("The CUSTOMER Spark") ===
      Seq((4, 12, "customer", "E_customer"), (13, 18, "spark", "E_spark")))
  }

  test("tokenizer handles repeated separators") {
    assert(GazetteerMatcher.tokenize("a  bc   d").toSeq ===
      Seq(("a", 0), ("bc", 3), ("d", 8)))
  }
}

/** Connected components: distributed star path vs driver union-find vs
  * brute-force oracle; idempotence; permutation invariance (SURVEY.md §5.1). */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def ccDistributed(edges: Seq[(String, String)]): Map[String, String] =
    Canonicalizer.connectedComponents(spark, edges.toDF("src", "dst"),
        smallGraphThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def ccLocal(edges: Seq[(String, String)]): Map[String, String] =
    Canonicalizer.connectedComponents(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def oracle(edges: Seq[(String, String)]): Map[String, String] =
    SequentialOracle.components(edges.map(e => SameAsEdge(e._1, e._2)))

  test("fixture graph: chains, cycle, star — all three implementations agree") {
    val e = Spec.SameAs.map(x => (x.src_entity, x.dst_entity))
    assert(ccLocal(e) === oracle(e))
    assert(ccDistributed(e) === oracle(e))
  }

  test("long path graph (worst case for label propagation)") {
    val e = (0 until 40).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    assert(ccDistributed(e) === oracle(e))
  }

  test("deterministic pseudo-random graph, distributed ≡ oracle") {
    // hash-derived edges, no RNG state (build reproducibility)
    val e = (0 until 300).map { i =>
      val a = (i * 7919) % 97; val b = (i * 104729 + 13) % 97
      (f"v$a%02d", f"v$b%02d")
    }.filter(x => x._1 != x._2)
    assert(ccDistributed(e) === oracle(e))
    assert(ccLocal(e) === oracle(e))
  }

  test("LONG-id graph: fast path and star path agree on NUMERIC min") {
    // round-3 regression: the union-find fast path used to cast ids to
    // string, silently swapping numeric min for lexicographic min on long
    // ids (canonical of {72, 377} became 377 because "377" < "72") and
    // disagreeing with the distributed star path
    val e = Seq((377L, 72L), (98L, 290L), (5L, 1000L), (1000L, 2L))
    val fast = Canonicalizer.connectedComponents(spark, e.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Canonicalizer.connectedComponents(spark, e.toDF("src", "dst"),
        smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(377L -> 72L, 72L -> 72L, 98L -> 98L, 290L -> 98L,
      5L -> 2L, 1000L -> 2L, 2L -> 2L)
    assert(fast === expect)
    assert(star === expect)
  }

  test("partition pre-contraction: contracted ≡ uncontracted ≡ oracle") {
    // round-4: components that straddle many partitions (each partition
    // holds an edge-disjoint slice) must survive local contraction — the
    // per-partition stars bridge through shared nodes
    val e = (0 until 400).map { i =>
      val a = (i * 7919) % 131; val b = (i * 104729 + 17) % 131
      (f"v$a%03d", f"v$b%03d")
    }.filter(x => x._1 != x._2)
    val df = e.toDF("src", "dst").repartition(13)
    val contracted = Canonicalizer.connectedComponents(spark, df,
        smallGraphThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val plain = Canonicalizer.connectedComponents(spark, df,
        smallGraphThreshold = 0L, preContract = false)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(contracted === plain)
    assert(contracted === oracle(e))
    // long ids across partitions: ordering stays numeric under contraction
    val le = Seq((377L, 72L), (72L, 9000L), (98L, 290L), (5L, 1000L),
      (1000L, 2L), (9000L, 377L))
    val lstar = Canonicalizer.connectedComponents(spark,
        le.toDF("src", "dst").repartition(4), smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lstar === Map(377L -> 72L, 9000L -> 72L, 72L -> 72L,
      98L -> 98L, 290L -> 98L, 5L -> 2L, 1000L -> 2L, 2L -> 2L))
  }

  test("idempotence: CC of its own output is a fixpoint") {
    val e = Spec.SameAs.map(x => (x.src_entity, x.dst_entity))
    val once = ccLocal(e)
    val again = ccLocal(once.toSeq)
    // mapping through `again` changes nothing
    assert(once.forall { case (_, c) => again.getOrElse(c, c) == c })
  }

  test("edge-orientation and order invariance") {
    val e = Spec.SameAs.map(x => (x.src_entity, x.dst_entity))
    val flipped = e.reverse.map(_.swap)
    assert(ccLocal(flipped) === ccLocal(e))
    assert(ccDistributed(flipped) === ccDistributed(e))
  }
}

/** C5 salted join ≡ plain join, on skewed data (SURVEY.md §5.1). */
class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on a head-skewed key distribution") {
    // 90% of left rows share one hot key
    val left = (0 until 2000)
      .map(i => (if (i % 10 != 0) "hot" else s"k${i % 50}", s"row$i"))
      .toDF("key", "payload")
    val right = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "dim")
    val plain = left.join(right, "key").select("key", "payload", "dim")
    val salted = Canonicalizer.saltedJoin(left, right, "key", "payload", k = 8)
      .select("key", "payload", "dim")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("left join type preserved for misses") {
    val left = Seq(("a", 1), ("zzz", 2)).toDF("key", "v")
    val right = Seq(("a", "x")).toDF("key", "d")
    val res = Canonicalizer.saltedJoin(left, right, "key", "v", k = 4,
      joinType = "left").collect()
    assert(res.length == 2)
  }
}

/** P5 span-sequence-equality invariant (BASELINE.json:15) as a property
  * over the deterministic generator + crafted docs. */
class SpanInvariantSpec extends SparkTestBase {
  import spark.implicits._

  test("explode+reassemble preserves (kind,text,media_ref,order) per doc") {
    val docs = InterleavedDocs.synthesize(spark, 300L, seed = 11L, skewPct = 10)
    val exploded = SpanOps.explodeSpans(docs)
    val check = SpanOps.spanSequenceEquality(docs, exploded)
    assert(check.filter(!col("ok")).count() == 0)
  }

  test("violation detected when a span is dropped") {
    val docs = InterleavedDocs.synthesize(spark, 50L, seed = 3L)
    val broken = SpanOps.explodeSpans(docs).filter(col("pos") =!= 1)
    val check = SpanOps.spanSequenceEquality(docs, broken)
    assert(check.filter(!col("ok")).count() > 0)
  }

  test("violation detected when spans are reordered/rewritten") {
    val docs = spark.createDataset(Seq(
      Doc("a", Seq(Span("text", "x", null, 0), Span("media", null, "m/1", 2)))))
    val rewritten = SpanOps.explodeSpans(docs)
      .withColumn("media_ref",
        when(col("kind") === "media", lit("m/EVIL")).otherwise(col("media_ref")))
    assert(SpanOps.spanSequenceEquality(docs, rewritten)
      .filter(!col("ok")).count() == 1)
  }

  test("generator invariants: offsets strictly increasing, kinds well-formed") {
    val docs = InterleavedDocs.synthesize(spark, 200L, seed = 5L).collect()
    docs.foreach { d =>
      val offs = d.spans.map(_.offset)
      assert(offs == offs.sorted && offs.distinct.size == offs.size, d.doc_id)
      d.spans.foreach { s =>
        assert((s.kind == "text" && s.text != null && s.media_ref == null) ||
          (s.kind == "media" && s.media_ref != null && s.text == null))
      }
    }
  }
}

/** Goldens for the KG report surface (GraphStats). */
class GraphStatsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val triples = Seq(
    ("s1", "p1", "o1"), ("s1", "p1", "o2"), ("s1", "p2", "o3"),
    ("s2", "p1", "o1"), ("s3", "p2", "o9"))
    .toDF("subj", "pred", "obj")

  test("degreeHistogram: known degrees") {
    val h = GraphStats.degreeHistogram(triples)
      .as[(Long, Long)].collect().toMap
    assert(h == Map(3L -> 1L, 1L -> 2L))
  }

  test("topHubs: boundary tie broken by subj ASC") {
    val t = Seq(("b", "p", "x"), ("a", "p", "x"), ("c", "p", "x"),
      ("a", "p", "y")).toDF("subj", "pred", "obj")
    val top2 = GraphStats.topHubs(t, k = 2).as[(String, Long)].collect()
    assert(top2.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("predicateCounts: totals reconcile to |triples|") {
    val pc = GraphStats.predicateCounts(triples)
      .as[(String, Long)].collect().toMap
    assert(pc == Map("p1" -> 3L, "p2" -> 2L))
    assert(pc.values.sum == triples.count())
  }

  test("pageRank: hand-computed golden (3 iters, d=0.85, micro-units)") {
    // ring A->B->C->A plus D->A; all out-degrees 1; D receives nothing
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A"), ("D", "A"))
      .toDF("src", "dst")
    val got = GraphStats.pageRank(edges).as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1127500L, "B" -> 1108375L,
      "C" -> 1614125L, "D" -> 150000L))
  }

  test("pageRank: node coverage, teleport floor, mass contraction") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("x", "a"),
      ("c", "x"), ("c", "a")).toDF("src", "dst")
    val pr = GraphStats.pageRank(edges, iters = 5).cache()
    val nNodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct().count()
    assert(pr.count() == nNodes &&
      pr.select(countDistinct("node")).as[Long].head() == nNodes)
    // every rank is at least the teleport term; total mass never grows
    // (no dangling redistribution + floor division only loses mass)
    assert(pr.filter(col("rank_micros") < 150000L).count() == 0)
    assert(pr.agg(sum("rank_micros")).as[Long].head() <= nNodes * 1000000L)
    pr.unpersist()
  }

  test("keySkewReport: exact log2 buckets + reconciliation laws") {
    // keys with counts 1, 2, 3, 8 -> buckets 0:{1}, 1:{2,3}, 3:{8}
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(8)("d")
    val df = rows.toDF("k")
    val got = GraphStats.keySkewReport(df, "k")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1L, 1L, 1L), (1L, 2L, 2L, 3L, 5L),
      (3L, 1L, 8L, 8L, 8L)))
    // laws on real triples: key totals and row totals reconcile, and
    // every bucket's [min,max] sits inside [2^b, 2^(b+1))
    val t = Pipeline.triples(spark,
      InterleavedDocs.synthesize(spark, 300L, seed = 9L))
    val rep = GraphStats.keySkewReport(t, "subj")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rep.map(_._2).sum == t.select("subj").distinct().count())
    assert(rep.map(_._5).sum == t.count())
    assert(rep.forall(r => r._3 >= (1L << r._1) && r._4 < (2L << r._1)))
  }

  test("cooccurrence: hand golden incl. lift fixed-point") {
    // d1:{A,B,C} d2:{A,B} d3:{A} -> N=3, c_A=3 c_B=2 c_C=1
    val t = Seq(("d1", "A"), ("d1", "B"), ("d1", "C"), ("d2", "A"),
      ("d2", "B"), ("d3", "A"))
      .map { case (d, e) => (d, "ex:mentions", e, "iri") }
      .toDF("subj", "pred", "obj", "obj_type")
    val got = GraphStats.cooccurrence(t)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", "B", 2L, 3L, 2L, 1000000L),
      ("A", "C", 1L, 3L, 1L, 1000000L),
      ("B", "C", 1L, 2L, 1L, 1500000L)))
  }

  test("cooccurrence: pair laws on the real pipeline triples") {
    val t = Pipeline.triples(spark,
      InterleavedDocs.synthesize(spark, 200L, seed = 5L))
    val co = GraphStats.cooccurrence(t).cache()
    // canonical orientation, co-count bounded by both marginals
    assert(co.filter(col("ent_a") >= col("ent_b")).count() == 0)
    assert(co.filter(col("c_ab") > col("c_a") ||
      col("c_ab") > col("c_b")).count() == 0)
    co.unpersist()
  }

  test("pageRank: partition-layout independent (exact integer math)") {
    val edges = Seq.tabulate(60) { i =>
      (s"n${i % 12}", s"n${(i * 7 + 3) % 12}")
    }.toDF("src", "dst")
    val a = GraphStats.pageRank(edges, iters = 4)
      .as[(String, Long)].collect().toMap
    val b = GraphStats.pageRank(edges.repartition(13), iters = 4)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
