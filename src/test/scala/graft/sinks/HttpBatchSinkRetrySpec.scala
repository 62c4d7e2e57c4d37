package graft.sinks

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.firehose.{FirehoseDecoder, FirehoseFixture}

/** Retry/backoff + dead-letter semantics of
  * [[HttpBatchSink.writeWithRetry]]: a transiently failing endpoint
  * must end with exactly-once batch delivery and an empty dead-letter
  * frame; a permanently failing block must land its rows — and only
  * its rows — in the dead letters while everything else delivers. */
class HttpBatchSinkRetrySpec extends SparkSpec {

  private def fixtureEvents() = {
    val dir = Files.createTempDirectory("sink_retry_spec").toFile
    val expected = FirehoseFixture.writeStandard(dir)
    (FirehoseDecoder.decode(spark, dir.getAbsolutePath + "/*"), expected)
  }

  import RetryCollector.batchKey

  test("fail-twice-then-succeed endpoint: every batch delivered exactly " +
      "once, dead-letter frame empty") {
    val (df, nEvents) = fixtureEvents()
    RetryCollector.reset()
    val dead = HttpBatchSink.writeWithRetry(df, batchSize = 3,
      maxRetries = 3, backoffMs = 1) { p =>
      val k = batchKey(p)
      val attempt = RetryCollector.attempts
        .computeIfAbsent(k, _ => new AtomicInteger).incrementAndGet()
      if (attempt <= 2) false
      else { RetryCollector.delivered.add(k); true }
    }
    assert(dead.count() == 0, "transient failures must not dead-letter")
    import scala.jdk.CollectionConverters._
    val deliveredBatches = RetryCollector.delivered.asScala.toSeq
    assert(deliveredBatches.distinct.size == deliveredBatches.size,
      "a batch must never deliver twice")
    assert(deliveredBatches.flatMap(_.split(",")).size == nEvents,
      "every event must deliver exactly once")
    // each batch took exactly 3 attempts (2 failures + 1 success)
    assert(RetryCollector.attempts.asScala.values.forall(_.get == 3))
  }

  test("permanently failing endpoint for one block: its rows dead-letter " +
      "with the input schema, the rest deliver once") {
    val (df, nEvents) = fixtureEvents()
    // the 5-event block of file 1 (ids ev-1-*) never succeeds
    RetryCollector.reset()
    val dead = HttpBatchSink.writeWithRetry(df, batchSize = 3,
      maxRetries = 2, backoffMs = 1) { p =>
      if (p.events.exists(_._2("id").startsWith("ev-1-"))) false
      else { RetryCollector.delivered.add(batchKey(p)); true }
    }
    val deadRows = dead.collect()
    assert(deadRows.nonEmpty)
    assert(deadRows.forall(_.getAs[String]("id").startsWith("ev-1-")),
      "only the failing block's rows may dead-letter")
    assert(dead.schema == df.schema,
      "dead letters must keep the input schema for replay")
    import scala.jdk.CollectionConverters._
    val deliveredIds = RetryCollector.delivered.asScala
      .flatMap(_.split(",")).toSet
    assert(deadRows.map(_.getAs[String]("id")).toSet ++ deliveredIds ==
      df.collect().map(_.getAs[String]("id")).toSet,
      "dead letters + deliveries must partition the input")
    assert(deadRows.length + deliveredIds.size == nEvents)
    // consuming the dead-letter frame again must NOT re-post: the
    // frame is eagerly materialized (exactly-once delivery)
    val attemptsBefore = RetryCollector.delivered.size
    dead.count()
    assert(RetryCollector.delivered.size == attemptsBefore,
      "re-reading the dead-letter frame re-executed the sink")
  }
}

/** JVM-static state shared between driver and local-mode executors
  * (the post closure serializes into tasks). */
object RetryCollector {
  val attempts = new ConcurrentHashMap[String, AtomicInteger]()
  val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { attempts.clear(); delivered.clear() }
  // static so post closures don't capture the (non-serializable) suite
  def batchKey(p: HttpBatchSink.Payload): String =
    p.events.map(_._2("id")).mkString(",")
}
