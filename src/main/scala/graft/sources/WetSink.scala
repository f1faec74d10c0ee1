package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, functions => F}

/**
 * WET-style sink: writes extracted text as WARC conversion records
 * (`*.warc.wet.gz`, one gzip MEMBER per record — the Common Crawl layout
 * `WarcSource` reads back), so a corpus curated here hands off to any
 * external WET consumer without conversion glue. The write is the WARC/WET
 * interop twin of the parquet tables, not a replacement for them.
 *
 * Scale/determinism stance:
 *  - one output file per partition, written EXECUTOR-side over the Hadoop
 *    FileSystem (no driver data; file count = partition count, so the
 *    caller sizes files by repartitioning first);
 *  - attempt-unique temp file + atomic rename on task success — the
 *    minimal output-commit protocol, so speculative or relaunched attempts
 *    of one partition never interleave writes into a published file;
 *  - `WARC-Date` comes from the caller's `runTs` (an ISO-8601 instant
 *    string) — never `now()` in data; `WARC-Record-ID` is a deterministic
 *    urn from xxhash64 of the url (never `randomUUID`), so a re-run is
 *    byte-identical and resume/compare semantics hold;
 *  - rows with a null url or text are skipped (a conversion record without
 *    a target or payload is meaningless);
 *  - Content-Length counts UTF-8 payload BYTES (multi-byte text must not
 *    truncate on read-back).
 */
object WetSink {

  /** Writes `df`'s (urlCol, textCol) as `part-NNNNN.warc.wet.gz` under
    * `outDir`; returns (files, records) — a bounded two-number summary,
    * not data. */
  def write(df: DataFrame, outDir: String, runTs: String,
            urlCol: String = "url", textCol: String = "text"): (Long, Long) = {
    val spark = df.sparkSession
    val conf = new WarcSource.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val counts = df
      .select(F.col(urlCol).cast("string"), F.col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { rows =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val dst = new org.apache.hadoop.fs.Path(f"$outDir/part-$pid%05d.warc.wet.gz")
        // attempt-unique temp + rename-on-task-success: the previous direct
        // create(dst, overwrite=true) bypassed Spark's output-commit protocol
        // — with speculative execution (or a relaunched attempt racing its
        // zombie) two live attempts of one partition wrote the SAME file
        // concurrently, producing interleaved/corrupt gzip. Each attempt now
        // writes its own temp file and publishes it with one atomic rename
        // only after its writes complete; a losing attempt's temp is deleted.
        // Content is deterministic per partition, so whichever attempt wins
        // the rename publishes identical bytes.
        val path = new org.apache.hadoop.fs.Path(
          f"$outDir/.part-$pid%05d.attempt-${tc.taskAttemptId()}.tmp")
        var n = 0L
        // created lazily on the FIRST kept row: empty/all-null partitions
        // must not litter zero-byte part files external WET tooling chokes on
        var raw: java.io.OutputStream = null
        // close() ends each member's native Deflater (finish() alone leaks
        // zlib memory until GC — millions of records per task add up); the
        // shield keeps the member close from closing the shared file stream
        final class Shield(out: java.io.OutputStream)
            extends java.io.FilterOutputStream(out) {
          override def write(b: Array[Byte], off: Int, len: Int): Unit =
            out.write(b, off, len)
          override def close(): Unit = flush()
        }
        val fs = dst.getFileSystem(conf.value)
        var committed = false
        try {
          try {
            rows.foreach { case (url, text) =>
              if (url != null && text != null) {
                if (raw == null) raw = fs.create(path, true)
                // one gzip member per record: WarcSource's reader (and CC
                // tooling) can resume at member boundaries
                val gz = new GZIPOutputStream(new Shield(raw), 1 << 16)
                val payload = text.getBytes(UTF_8)
                val rid = java.lang.Long.toHexString(
                  graft.text.TextHash.hashToken(url, 0, url.length, 0x77e7L))
                val head =
                  "WARC/1.0\r\n" +
                    "WARC-Type: conversion\r\n" +
                    s"WARC-Target-URI: $url\r\n" +
                    s"WARC-Date: $runTs\r\n" +
                    s"WARC-Record-ID: <urn:graft:$rid>\r\n" +
                    "Content-Type: text/plain\r\n" +
                    s"Content-Length: ${payload.length}\r\n\r\n"
                gz.write(head.getBytes(UTF_8))
                gz.write(payload)
                gz.write("\r\n\r\n".getBytes(UTF_8))
                gz.close()
                n += 1
              }
            }
          } finally if (raw != null) raw.close()
          // task-commit: publish the finished temp file under the final name.
          // delete-then-rename keeps re-runs over the same outDir idempotent
          // (the overwrite=true the direct write relied on); a lost rename
          // race means another attempt already published identical bytes.
          if (n > 0) {
            fs.delete(dst, false)
            if (!fs.rename(path, dst)) {
              // lost the race to another attempt (identical bytes already
              // published) — or a real FS fault: records must never vanish
              // silently, so no winner file means FAIL the task (retry)
              val winnerExists = fs.exists(dst)
              fs.delete(path, false)
              if (!winnerExists)
                throw new java.io.IOException(s"WetSink: failed to publish $dst")
            }
          }
          committed = true
        } finally if (!committed) fs.delete(path, false)
        if (n > 0) Iterator.single((1L, n)) else Iterator.empty
      }
      .collect()
    (counts.length.toLong, counts.map(_._2).sum)
  }
}
