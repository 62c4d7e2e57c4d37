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
