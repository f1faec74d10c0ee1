package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Plan-evidence dumper: writes `.explain("formatted")` output for named
 * SparkEntry queries to `<outDir>/<query>.txt` — the committed artifact the
 * optimization rounds use to prove plan-shape claims (the before/after txt
 * files under plans/rNN). Never timed, never part of the bench contract.
 *
 * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [query...]
 * (no query names = all queries). Queries that commit model/index tables at
 * construction (q37/q94/q98/q99) run those build jobs here like anywhere
 * else — read-if-committed, so a warm model dir keeps this fast.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$n.txt"), txt)
      System.err.println(s"plan: $n")
    }
    spark.stop()
  }
}
