package graft.firehose

import java.nio.file.Files

import graft.SparkSpec
import graft.sinks.HttpBatchSink

/** Golden + property coverage of the Firehose decode core — the
  * semantics pinned in SURVEY.md §2.1 / §5.2-5.3 and FIXTURES.md §A.
  * Property tests use a seeded RNG (no scalatestplus bridge in the
  * offline cache), so every run exercises the same 200 cases.
  */
class FirehoseDecoderSpec extends SparkSpec {
  import FirehoseDecoder._

  // --- unit: gunzipAll -------------------------------------------------

  test("gunzipAll is identity on plain bytes") {
    val b = "hello".getBytes("UTF-8")
    assert(gunzipAll(b).sameElements(b))
  }

  test("gunzipAll unwraps single, double, and triple gzip") {
    val b = "payload-bytes".getBytes("UTF-8")
    for (n <- 1 to 3) {
      val wrapped = (1 to n).foldLeft(b)((acc, _) => FirehoseFixture.gzip(acc))
      assert(gunzipAll(wrapped).sameElements(b), s"n=$n")
    }
  }

  test("gunzipAll reads all members of a concatenated gzip file") {
    val joined = FirehoseFixture.gzip("part1|".getBytes("UTF-8")) ++
      FirehoseFixture.gzip("part2".getBytes("UTF-8"))
    assert(new String(gunzipAll(joined), "UTF-8") == "part1|part2")
  }

  // --- unit + property: splitBlocks ------------------------------------

  test("zero delimiters yields zero blocks (kinesis-to-humio.py:114-115)") {
    assert(splitBlocks("no message here".getBytes("UTF-8")).isEmpty)
    assert(splitBlocks(Array.emptyByteArray).isEmpty)
  }

  test("leading garbage before first delimiter is dropped, last block runs to EOF") {
    val d = new String(Delimiter, "UTF-8")
    val bytes = ("garbage" + d + ",\"x\":1}tail-of-last-block")
      .getBytes("UTF-8")
    val blocks = splitBlocks(bytes)
    assert(blocks.size == 1)
    assert(blocks.head.startsWith(d))
    assert(blocks.head.endsWith("tail-of-last-block"))
  }

  test("delimiter inside a message splits anyway (replicated reference behavior)") {
    val d = new String(Delimiter, "UTF-8")
    val block = FirehoseFixture.block(0, 1, "s1").replace(
      "line 0 of block 0", s"evil $d inside")
    assert(splitBlocks(block.getBytes("UTF-8")).size == 2)
  }

  test("property: splitBlocks(concat(blocks)) == blocks (200 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val d = new String(Delimiter, "UTF-8")
    for (_ <- 1 to 200) {
      val blocks = (0 until rnd.nextInt(6)).map { _ =>
        // content must not itself contain the delimiter (§7.3: inner
        // occurrences intentionally split — covered by its own test)
        val body = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
        s"""$d,"rest":"$body"}"""
      }
      assert(splitBlocks(blocks.mkString("").getBytes("UTF-8")) == blocks)
    }
  }

  test("property: gunzipAll(gzip^n(x)) == x for n in 0..3 (200 seeded cases)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val raw = Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)
      // keep the payload itself from starting with gzip magic — the
      // decode loop would (correctly) keep unwrapping it otherwise
      if (raw.length >= 2 && raw(0) == 0x1f.toByte) raw(0) = 'x'.toByte
      val n = rnd.nextInt(4)
      val wrapped = (1 to n).foldLeft(raw)((a, _) => FirehoseFixture.gzip(a))
      assert(gunzipAll(wrapped).sameElements(raw))
    }
  }

  // --- end-to-end decode over the standard fixture ---------------------

  def fixtureEvents() = {
    val dir = Files.createTempDirectory("fh_spec").toFile
    val expected = FirehoseFixture.writeStandard(dir)
    (decode(spark, dir.getAbsolutePath + "/*"), expected)
  }

  test("decode: one row per event, enriched + prefixed (golden)") {
    val (df, expected) = fixtureEvents()
    val rows = df.collect()
    assert(rows.length == expected)
    val byId = rows.map(r => r.getAs[String]("id") -> r).toMap
    // block 0: logStream with >2 segments → first two joined
    val r0 = byId("ev-0-1")
    assert(r0.getAs[String]("logStreamPrefix") == "2023/11")
    assert(r0.getAs[String]("logGroup") == "/aws/lambda/app")
    assert(r0.getAs[Long]("timestamp") == FirehoseFixture.BaseTs + 1)
    assert(r0.getAs[String]("message") == "line 1 of block 0")
    assert(r0.getAs[String]("file").endsWith("plain.log"))
    // single-gzip block, <2-segment logStream → whole name (lenient
    // slice, kinesis-to-humio.py:137 semantics)
    val r2 = byId("ev-2-0")
    assert(r2.getAs[String]("logStreamPrefix") == "shortstream")
    assert(r2.getAs[String]("file").endsWith("single.gz"))
    // double-gzip block decodes too
    val r3 = byId("ev-3-1")
    assert(r3.getAs[String]("logStreamPrefix") == "a/b")
    assert(r3.getAs[String]("file").endsWith("double.gz.gz"))
  }

  test("decode: zero-delimiter file contributes zero rows, no error") {
    val (df, _) = fixtureEvents()
    assert(df.filter(df("file").endsWith("nodelim.log")).count() == 0)
  }

  // --- batching (R13) ---------------------------------------------------

  test("batch ids are block-scoped and size-bounded") {
    val (df, _) = fixtureEvents()
    val batched = withBatchId(df, batchSize = 2)
    val sizes = batched.groupBy("file", "block_idx", "batch_id").count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.forall(_ <= 2))
    // block 1 has 5 events → batches of 2,2,1 within the block
    val b1 = batched.filter(batched("block_idx") === 1)
      .groupBy("batch_id").count().collect()
      .map(r => r.getAs[Int]("batch_id") -> r.getAs[Long]("count")).toMap
    assert(b1 == Map(0 -> 2, 1 -> 2, 2 -> 1))
  }

  test("HttpBatchSink: batches never span blocks, tags constant, failures counted") {
    val (df, _) = fixtureEvents()
    // Collector must be a JVM-static object: the post closure is
    // serialized into tasks, so an instance queue would stay empty on
    // the driver even in local mode.
    PostCollector.queue.clear()
    val failed = HttpBatchSink.write(df, batchSize = 3) { p =>
      PostCollector.queue.add(p); p.events.nonEmpty
    }
    import scala.jdk.CollectionConverters._
    val payloads = PostCollector.queue.asScala.toSeq
    assert(failed == 0)
    assert(payloads.map(_.events.size).sum == 14)
    assert(payloads.forall(_.events.size <= 3))
    // every payload's events share one block (tags constant within batch)
    assert(payloads.forall(p =>
      p.events.map(_._2("logStream")).distinct.size == 1))
    // block of 5 with batchSize 3 → 3+2 (flush at block end, :150)
    val sizesFor5 = payloads.filter(
      _.events.head._2("id").startsWith("ev-1-")).map(_.events.size).sorted
    assert(sizesFor5 == Seq(2, 3))
  }
}

/** JVM-static payload collector shared between driver and local-mode
  * executors (see note at the call site). */
object PostCollector {
  val queue = new java.util.concurrent.ConcurrentLinkedQueue[
    HttpBatchSink.Payload]()
}

/** JVM-static collector for the streaming foreachBatch sink spec. */
object PostCollectorS8 {
  val queue = new java.util.concurrent.ConcurrentLinkedQueue[
    graft.sinks.HttpBatchSink.Payload]()
}

/** R12 payload-shaping spec appended separately to keep the main
  * suite structure intact. */
class FirehosePayloadSpec extends graft.SparkSpec {
  test("R12 payloads: valid JSON envelopes, block-scoped, size-bounded") {
    val df = graft.queries.PipelineQueries.firehosePayloads(
      spark, batchSize = 3)
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("n_events")).sum == 14)
    assert(rows.forall(_.getAs[Int]("n_events") <= 3))
    // payloads parse back: tags constant, events carry the envelope
    val parsed = spark.read.json(
      spark.createDataset(rows.map(_.getAs[String]("payload")).toSeq)(
        org.apache.spark.sql.Encoders.STRING))
    import org.apache.spark.sql.functions._
    val n = parsed.select(explode(col("events")).as("e"))
      .select(col("e.timestamp"), col("e.attributes.message"))
      .count()
    assert(n == 14)
    assert(parsed.select("tags.logGroup").distinct().count() == 1)
    // block of 5 with batchSize 3 flushes 3 + 2 (kinesis-to-humio.py:150)
    val b1 = rows.filter(r => r.getAs[String]("file") == "plain.log" &&
      r.getAs[Int]("block_idx") == 1).map(_.getAs[Int]("n_events")).sorted
    assert(b1.toSeq == Seq(2, 3))
  }
}

/** Typed-surface spec. */
class FirehoseTypedSpec extends graft.SparkSpec {
  test("decodeTyped yields the same events with compile-time fields") {
    val dir = java.nio.file.Files.createTempDirectory("fh_typed").toFile
    val expected = FirehoseFixture.writeStandard(dir)
    val ds = FirehoseDecoder.decodeTyped(spark, dir.getAbsolutePath + "/*")
    val evs: Array[FirehoseEvent] = ds.collect()
    assert(evs.length == expected)
    val e = evs.find(_.id == "ev-0-2").get
    assert(e.timestamp == FirehoseFixture.BaseTs + 2 &&
      e.logStreamPrefix == "2023/11" && e.event_idx == 2)
  }
}
