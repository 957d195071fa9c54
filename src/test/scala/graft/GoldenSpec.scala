package graft

import scala.io.Source

import graft.sources.{InterleavedDocs, TripleSink}

/** Committed golden N-Triples dump of the sf0.001 corpus (SURVEY.md §5.1
  * item 4): byte-stable regression anchor for the full pipeline + S6
  * export. Deterministic because the corpus construction, URI salt and
  * the global sort are all frozen; any diff means the emitted triple set
  * or its serialization changed. Regenerate (deliberately!) with:
  * `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.GoldenSpec"` then inspect
  * the diff before committing.
  */
class GoldenSpec extends SparkTestBase {

  private val goldenPath = "src/test/resources/golden_sf0001.nt"

  test("sf0.001 N-Triples export matches the committed golden byte-for-byte") {
    val lines = TripleSink.toNTriples(
        Pipeline.triples(spark,
          InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001")))
      .collect().map(_.getString(0))

    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.write(java.nio.file.Paths.get(goldenPath),
        lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"regenerated $goldenPath (${lines.length} lines)")
    }

    val src = Source.fromFile(goldenPath, "UTF-8")
    val golden = try src.getLines().toVector finally src.close()
    assert(lines.length == golden.length,
      s"triple count drifted: ${lines.length} vs golden ${golden.length}")
    lines.zip(golden).zipWithIndex.collectFirst {
      case ((got, want), i) if got != want => (i, got, want)
    }.foreach { case (i, got, want) =>
      fail(s"golden mismatch at line $i:\n  got:  $got\n  want: $want")
    }
  }
}
