package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-semantics emulation (SURVEY.md §7.0 — no Iceberg runtime jar exists in
 * this sandbox): a table is a directory of bucket-partitioned parquet plus a
 * `_manifests/` log of immutable snapshot JSON files. Each snapshot records the
 * run, schema fingerprint, bucket list with row counts and digests, and the
 * parent snapshot — giving append/overwrite visibility, time-travel-by-run, and
 * a commit record that pairs with the lineage table for checkpoint-resume.
 *
 * Isolated behind this object so a real `iceberg-spark-runtime` catalog could
 * replace it without touching pipeline code.
 */
object CatalogIO {

  final case class BucketEntry(bucket: Int, rowCount: Long, digest: String)
  final case class Snapshot(
      snapshotId: String,
      runId: String,
      parent: String, // "" for first
      createdUtcMs: Long,
      buckets: Seq[BucketEntry]
  )

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def writeSnapshot(spark: SparkSession, tableDir: String, snap: Snapshot): Unit = {
    val dir = new Path(s"$tableDir/_manifests")
    val f = fs(spark, tableDir)
    f.mkdirs(dir)
    val body = {
      val bs = snap.buckets.sortBy(_.bucket).map { b =>
        s"""{"bucket":${b.bucket},"row_count":${b.rowCount},"digest":"${esc(b.digest)}"}"""
      }.mkString("[", ",", "]")
      s"""{"snapshot_id":"${esc(snap.snapshotId)}","run_id":"${esc(snap.runId)}","parent":"${esc(snap.parent)}","created_utc_ms":${snap.createdUtcMs},"buckets":$bs}"""
    }
    // two-phase: write tmp, rename into place (atomic on local/HDFS)
    val tmp = new Path(dir, s".${snap.snapshotId}.json.tmp")
    val dst = new Path(dir, s"${snap.snapshotId}.json")
    val out = f.create(tmp, true)
    out.write(body.getBytes(StandardCharsets.UTF_8))
    out.close()
    f.rename(tmp, dst)
  }

  /** Snapshot ids in lexicographic (= commit) order. */
  def listSnapshots(spark: SparkSession, tableDir: String): Seq[String] = {
    val dir = new Path(s"$tableDir/_manifests")
    val f = fs(spark, tableDir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).sorted.toSeq
  }

  def latestSnapshot(spark: SparkSession, tableDir: String): Option[String] =
    listSnapshots(spark, tableDir).lastOption

  /** Retention (F5, reference cleanup job database_manager.py:537-568):
    * delete all but the newest `keepLast` snapshot manifests. Data files are
    * NOT touched — buckets are overwritten in place per run, so old snapshots
    * are metadata-only views; expiring them bounds the manifest log. Returns
    * the expired snapshot ids. */
  def expireSnapshots(spark: SparkSession, tableDir: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val all = listSnapshots(spark, tableDir)
    val expire = all.dropRight(keepLast)
    val f = fs(spark, tableDir)
    expire.foreach { id =>
      f.delete(new Path(s"$tableDir/_manifests/$id.json"), false)
    }
    expire
  }

  /** Commit a corpus-sized DERIVED table (dedup signature index, inverted
    * file) as an immutable snapshot: write data, then a manifest carrying the
    * row count and an order-invariant content digest — readers trust only
    * manifested tables, so a crashed half-write is retried, never half-read.
    * Unlike the driver-sized ANN model tables the digest is computed
    * DISTRIBUTED (bit-xor of per-row xxhash64 over every column cast to
    * string — order-invariant by design), and the data keeps its
    * partitioning. The shared protocol behind `DedupOps.indexFor` and
    * `Bm25.indexFor`. */
  def writeDerived(df: DataFrame, dir: String, runId: String): Unit = {
    val spark = df.sparkSession
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
    val back = spark.read.parquet(s"$dir/data")
    val hashed = back.columns.toSeq.map(c => col(c).cast("string"))
    val row = back.agg(
      count(lit(1)).as("n"), bit_xor(xxhash64(hashed: _*)).as("dig")).collect()(0)
    writeSnapshot(spark, dir, Snapshot(
      snapshotId = s"$runId-0", runId = runId, parent = "",
      createdUtcMs = System.currentTimeMillis(),
      buckets = Seq(BucketEntry(0, row.getLong(0),
        java.lang.Long.toHexString(if (row.isNullAt(1)) 0L else row.getLong(1))))))
  }

  /** Read a committed derived table; refuses an unmanifested (half-written)
    * dir. */
  def readDerived(spark: SparkSession, dir: String): DataFrame = {
    require(latestSnapshot(spark, dir).isDefined,
      s"no committed derived table at $dir")
    spark.read.parquet(s"$dir/data")
  }

  /** Read-if-committed else build-and-commit — the train-once contract for
    * corpus-sized derived tables: `build` runs at most once per snapshot dir;
    * every later call reads the committed parquet. Same staleness caveat as
    * the ANN model dirs: key `dir` by corpus snapshot path — a corpus mutated
    * in place keeps serving the old table. */
  def derivedFor(spark: SparkSession, dir: String, runId: String)
                (build: => DataFrame): DataFrame = {
    if (latestSnapshot(spark, dir).isEmpty) writeDerived(build, dir, runId)
    readDerived(spark, dir)
  }

  def readSnapshotJson(spark: SparkSession, tableDir: String, snapshotId: String): String = {
    val p = new Path(s"$tableDir/_manifests/$snapshotId.json")
    val in = fs(spark, tableDir).open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) { bytes.write(buf, 0, k); k = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }
}
