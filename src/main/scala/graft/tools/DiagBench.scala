package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the extraction plan (diagnostic). */
object DiagBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val path = args.lift(1).getOrElse("/tmp/graft-scaling/pages_1000000")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s n=$n sec=$sec%6.2f rate=${n / sec}%10.1f/s")
    }
    val df = spark.read.parquet(path)
    println("partitions=" + df.rdd.getNumPartitions)
    // warmups
    df.limit(50000).select(graft.functions.extract_any_text(col("html")).as("t")).filter(col("t").isNotNull).count()

    time("scan_count")(df.count())
    time("scan_len_html")(df.select(length(col("html")).as("l")).filter(col("l") >= 0).count())
    time("scan_sha_html")(df.select(sha2(col("html"), 256).as("s")).filter(col("s").isNotNull).count())
    time("extract_only")(df.select(graft.functions.extract_any_text(col("html")).as("t")).filter(col("t").isNotNull).count())
    time("extract_plus_sha")(df.select(graft.functions.text_digest(graft.functions.extract_any_text(col("html"))).as("d")).filter(col("d").isNotNull).count())
    df.select(graft.functions.extract_any_text(col("html")).as("t")).explain("formatted")
    spark.stop()
  }
}
