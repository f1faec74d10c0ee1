package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan audits (SURVEY.md §4): the scale properties the engine relies on
 * must be visible in the plan, not assumed — filter pushdown to the parquet scan,
 * column pruning, broadcast joins for small dims, and whole-stage codegen over
 * the extraction expressions.
 */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan
    val resolved = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    resolved.toString
  }

  test("mode filter (text IS NULL) is pushed to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("plan-audit").toString
    fixtures.Corpus.pages(spark, 200).write.parquet(s"$dir/pages")
    val pages = spark.read.parquet(s"$dir/pages")
    val (toProcess, _) = pipeline.ExtractPipeline.modeFilter(pages, "cli")
    val s = toProcess.queryExecution.executedPlan.toString
    assert(s.contains("PushedFilters: [IsNull(text)]"), s)
  }

  test("broadcast join used for small dimension (orders x customer)") {
    val df = SparkEntry.queries("q02_join_broadcast_segment")(spark, sf)
    val s = planString(df.groupBy().count()) // force final plan materialization shape
    val s2 = planString(df)
    assert(s2.contains("BroadcastHashJoin") || s.contains("BroadcastHashJoin"), s2)
  }

  test("multi-join rollup broadcasts both dims, no sort-merge join") {
    val s = planString(SparkEntry.queries("q05_region_rollup")(spark, sf))
    assert(s.contains("BroadcastHashJoin"))
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("column pruning: simhash query reads only (doc_id, text)") {
    val s = planString(SparkEntry.queries("q14_simhash")(spark, sf))
    val scanLine = s.linesIterator.find(_.contains("ReadSchema")).getOrElse(fail(s))
    assert(scanLine.contains("doc_id") && scanLine.contains("text"), scanLine)
    assert(!scanLine.contains("n_chars") && !scanLine.contains("source"), scanLine)
  }

  test("string-output extraction expressions run inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("plan-audit2").toString
    fixtures.Corpus.pages(spark, 50).write.parquet(s"$dir/pages")
    val df = spark.read.parquet(s"$dir/pages")
      .select(graft.functions.extract_any_text(col("html")).as("t"),
        graft.functions.text_digest(graft.functions.extract_any_text(col("html"))).as("d"))
    val s = planString(df)
    // the Project carrying our expressions must be inside a WholeStageCodegen stage:
    // formatted-plan marks codegen'd operators with an asterisk
    val projLine = s.linesIterator.find(l => l.contains("Project") && l.contains("extractanytext")).getOrElse(
      s.linesIterator.find(_.contains("Project")).getOrElse(fail(s)))
    assert(projLine.trim.startsWith("*"), s"Project not codegen'd:\n$s")
    df.count() // and the generated code actually compiles + runs
  }

  test("bucket filter pushes below the extraction projection (commit-group pruning)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("plan-audit3").toString
    fixtures.Corpus.pages(spark, 50).write.parquet(s"$dir/pages")
    val pages = spark.read.parquet(s"$dir/pages")
    val extracted = pipeline.ExtractPipeline.extract(pages, pipeline.ExtractPipeline.Config())
    val filtered = extracted.filter(col(pipeline.ExtractPipeline.BucketCol).isin(1, 2, 3))
    val plan = filtered.queryExecution.optimizedPlan.toString
    // after pushdown the predicate is re-expressed on xxhash64(url) and no longer
    // sits above the extraction Project — extraction must not run for pruned buckets
    val lines = plan.linesIterator.toList
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.toLowerCase.contains("xxhash64"))
    val projIdx = lines.indexWhere(l => l.toLowerCase.contains("extractdoc") || l.toLowerCase.contains("extractanytext"))
    assert(filterIdx >= 0, plan)
    assert(projIdx >= 0, plan)
    assert(filterIdx > projIdx, s"filter (line $filterIdx) should be BELOW extraction project (line $projIdx):\n$plan")
  }

  test("partial aggregation (map-side combine) present in groupBy plans") {
    val s = planString(SparkEntry.queries("q01_agg_pricing")(spark, sf))
    // two HashAggregate nodes (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(s).size >= 2, s)
  }

  test("no cartesian products in any LSH/dedup/ANN candidate plan") {
    // every near-dup/ANN path must join on bucket keys — a cross join in any
    // of these plans is the exact scale failure the LSH machinery exists to
    // prevent (q16 is the documented exact baseline and is exempt)
    val bucketJoined = Seq("q13_minhash_near_dups", "q28_ann_lsh_bucketed",
      "q31_near_dup_pairs", "q32_simhash_near_dups", "q33_verified_near_dups",
      "q34_embedding_near_dups", "q37_ann_ivf")
    bucketJoined.foreach { q =>
      val s = planString(SparkEntry.queries(q)(spark, sf))
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s"$q plan contains a cross join:\n${s.take(2000)}")
    }
  }
}
