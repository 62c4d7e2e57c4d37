package graft.firehose

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.util.zip.GZIPOutputStream

/** Deterministic generator for Firehose/CloudWatch fixture files
  * (FIXTURES.md §A) — the reference ships no sample data, so tests
  * and `q_firehose_pipeline` synthesize the format from the field
  * accesses in `kinesis-to-humio.py:131-148`.
  *
  * Everything is seeded arithmetic (no RNG, no clock) so repeated
  * generation is byte-identical and the pipeline output is a stable
  * oracle target.
  */
object FirehoseFixture {
  val BaseTs = 1700000000000L // epoch millis

  def block(blockIdx: Int, nEvents: Int, logStream: String,
            logGroup: String = "/aws/lambda/app"): String = {
    val events = (0 until nEvents).map { e =>
      val ts = BaseTs + blockIdx.toLong * 100000 + e
      s"""{"id":"ev-$blockIdx-$e","timestamp":$ts,"message":"line $e of block $blockIdx"}"""
    }.mkString(",")
    s"""{"messageType":"DATA_MESSAGE","owner":"123456789012","logGroup":"$logGroup","logStream":"$logStream","subscriptionFilters":["all"],"logEvents":[$events]}"""
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  def write(dir: File, name: String, bytes: Array[Byte]): File = {
    dir.mkdirs()
    val f = new File(dir, name)
    val out = new FileOutputStream(f)
    try out.write(bytes) finally out.close()
    f
  }

  /** A larger multi-file corpus for throughput measurement: `nFiles`
    * gzip'd files of `blocks` blocks × `events` events each,
    * deterministic content. Skips generation if the directory already
    * has the right file count (files are byte-identical anyway). */
  def writeLarge(dir: File, nFiles: Int = 32, blocks: Int = 25,
                 events: Int = 250): Long = {
    val existing = Option(dir.listFiles()).map(_.length).getOrElse(0)
    if (existing != nFiles) {
      Option(dir.listFiles()).foreach(_.foreach(_.delete()))
      (0 until nFiles).foreach { f =>
        val body = (0 until blocks).map(b =>
          block(f * blocks + b, events,
            f"2024/01/${f % 28 + 1}%02d/app/i-$f")).mkString
        write(dir, f"part-$f%05d.gz", gzip(body.getBytes("UTF-8")))
      }
    }
    nFiles.toLong * blocks * events
  }

  /** Like [[block]] but with deterministic LOW-QUALITY events mixed
    * in: every event with index e ≡ 3 (mod 4) carries a one-word
    * message (`noise<e>`) that a word-count quality gate drops. Used
    * by the streaming-pipeline fixture, where the oracle reconstructs
    * exactly which events survive the gate. */
  def blockNoisy(blockIdx: Int, nEvents: Int, logStream: String,
                 logGroup: String = "/aws/lambda/app"): String = {
    val events = (0 until nEvents).map { e =>
      val ts = BaseTs + blockIdx.toLong * 100000 + e
      val msg = if (e % 4 == 3) s"noise$e"
        else s"line $e of block $blockIdx"
      s"""{"id":"ev-$blockIdx-$e","timestamp":$ts,"message":"$msg"}"""
    }.mkString(",")
    s"""{"messageType":"DATA_MESSAGE","owner":"123456789012","logGroup":"$logGroup","logStream":"$logStream","subscriptionFilters":["all"],"logEvents":[$events]}"""
  }

  /** The STREAMING-pipeline fixture: four files with STRICTLY
    * ASCENDING modification times (10 s apart), so the file source
    * admits them oldest-first and `maxFilesPerTrigger=1` maps one
    * file to one micro-batch deterministically. Content exercises
    * the whole ingest chain:
    *   f1.gz        blocks 10 (3 ev) + 11 (4 ev, one noise)
    *   f2.log       plain, block 12 (5 ev, one noise)
    *   f3.gz        REDELIVERY of block 10 (same ids — the Kinesis
    *                at-least-once shape) + new block 13 (2 ev)
    *   f4.gz.gz     double-gzip, block 14 (3 ev), 1-segment logStream
    * Idempotent and byte-identical across regenerations. */
  def writeStreaming(dir: File): Unit = {
    val f1 = write(dir, "f1.gz", gzip(
      (blockNoisy(10, 3, "2024/05/01/app/i-1") +
        blockNoisy(11, 4, "2024/05/01/app/i-2")).getBytes("UTF-8")))
    val f2 = write(dir, "f2.log",
      blockNoisy(12, 5, "2024/05/02/app/i-3").getBytes("UTF-8"))
    val f3 = write(dir, "f3.gz", gzip(
      (blockNoisy(10, 3, "2024/05/01/app/i-1") +
        blockNoisy(13, 2, "2024/05/03/app/i-4")).getBytes("UTF-8")))
    val f4 = write(dir, "f4.gz.gz", gzip(gzip(
      blockNoisy(14, 3, "shorty").getBytes("UTF-8"))))
    Seq(f1, f2, f3, f4).zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(
          BaseTs + i.toLong * 10000))
    }
  }

  /** The standard fixture set: plain / gzip / double-gzip files with
    * several blocks, a <2-segment logStream, and a zero-delimiter
    * file (must yield 0 events, not an error). Returns total expected
    * event count. Idempotent — regenerating produces identical bytes.
    */
  def writeStandard(dir: File): Int = {
    val multi = (block(0, 3, "2023/11/01/app/instance-1") +
      block(1, 5, "2023/11/02/app/instance-2")).getBytes("UTF-8")
    write(dir, "plain.log", multi)
    write(dir, "single.gz",
      gzip(block(2, 4, "shortstream").getBytes("UTF-8")))
    write(dir, "double.gz.gz",
      gzip(gzip(block(3, 2, "a/b/c/d").getBytes("UTF-8"))))
    write(dir, "nodelim.log",
      """{"messageType":"CONTROL_MESSAGE","logEvents":[]}""".getBytes("UTF-8"))
    3 + 5 + 4 + 2
  }
}
