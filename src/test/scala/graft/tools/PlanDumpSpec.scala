package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Scratch plan-dump helper (run with `testOnly graft.tools.PlanDumpSpec`):
  * writes a query's final adaptive plan to /tmp for inspection. */
class PlanDumpSpec extends AnyFunSuite with SparkTestBase {

  test("dump q57 plan") {
    val df = SparkEntry.queries("q57_dsir_weights")(spark, "/root/testdata/sf0.001")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/q57_plan.txt"),
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(s.nonEmpty)
  }
}
