package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive._
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import graft.operators.{Canonicalizer, Dedup}

object ProbeR6d {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchShapes.session()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("cc")) {
      Canonicalizer.connectedComponents(spark,
        BenchShapes.cc600kEdges(spark), smallGraphThreshold = 0L).count()
      println("PROBE ran cc prefix")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = Dedup.minHashLshPairs(docs, 3, 64, 16, 0.5,
      maxDocFreq = graft.model.Spec.DedupMaxDocFreq, portable = true)
    val t0 = System.nanoTime()
    df.collect()
    println(f"PROBE minhash one-shot: ${(System.nanoTime()-t0)/1e9}%.2f s")
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case q: QueryStageExec => all(q.plan)
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case r: ReusedExchangeExec => Seq.empty
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(all) ++ extra)
    }
    val nodes = all(df.queryExecution.executedPlan)
    println("PROBE nodes=" + nodes.size)
    nodes.foreach { n =>
      val m = n.metrics.filter { case (k, v) =>
        v.value > 0 && (k.contains("Time") || k.contains("time") ||
          k.contains("duration") || k == "numOutputRows") }
      if (m.nonEmpty) {
        val s = m.map { case (k, v) => s"$k=${v.value}" }.mkString(" ")
        println(s"PROBEM ${n.nodeName.take(36)} | $s")
      }
    }
    spark.stop()
  }
}
