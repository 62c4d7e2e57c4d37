package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.firehose.{FirehoseDecoder, FirehoseFixture}

/** R4/R15 batch semantics + the permissive decode and R17
  * observability added on top of the reference behavior. */
class BatchIngestSpec extends SparkSpec {

  test("ingestOnce processes each file exactly once across runs") {
    val staging = Files.createTempDirectory("bi_staging").toFile
    val log = Files.createTempDirectory("bi_log").toFile.getAbsolutePath +
      "/processed"
    FirehoseFixture.write(staging, "a.log",
      FirehoseFixture.block(0, 3, "s/a").getBytes("UTF-8"))
    val glob = staging.getAbsolutePath + "/*"

    val first = BatchIngest.ingestOnce(spark, glob, log).collect()
    assert(first.length == 3)

    // run again with no new files: anti-join filters everything
    val second = BatchIngest.ingestOnce(spark, glob, log).collect()
    assert(second.isEmpty)

    // add a file: only the new one decodes
    FirehoseFixture.write(staging, "b.gz",
      FirehoseFixture.gzip(FirehoseFixture.block(1, 2, "s/b").getBytes("UTF-8")))
    val third = BatchIngest.ingestOnce(spark, glob, log).collect()
    assert(third.map(_.getAs[String]("id")).sorted.toSeq ==
      Seq("ev-1-0", "ev-1-1"))
  }

  test("ingestOnce's returned frame survives re-evaluation after the " +
      "log append") {
    val staging = Files.createTempDirectory("bi_replan").toFile
    val log = Files.createTempDirectory("bi_replan_log").toFile
      .getAbsolutePath + "/processed"
    FirehoseFixture.write(staging, "a.log",
      FirehoseFixture.block(0, 3, "s/a").getBytes("UTF-8"))
    val events = BatchIngest.ingestOnce(
      spark, staging.getAbsolutePath + "/*", log)
    // By the time we evaluate, the paths are already in the log. A
    // plan still anti-joining against the log would now return zero
    // rows; the pinned-path plan must return the batch on EVERY
    // evaluation.
    assert(events.count() == 3)
    assert(events.count() == 3)
  }

  test("permissive decode skips corrupt gzip and counts it; strict fails") {
    val dir = Files.createTempDirectory("bi_corrupt").toFile
    FirehoseFixture.write(dir, "good.log",
      FirehoseFixture.block(0, 2, "s/x").getBytes("UTF-8"))
    FirehoseFixture.write(dir, "bad.gz",
      FirehoseFixture.gzip("x".getBytes("UTF-8")).take(8))
    val glob = dir.getAbsolutePath + "/*"

    val counter = spark.sparkContext.longAccumulator("corrupt_test")
    val rows = FirehoseDecoder.blocks(spark, glob, permissive = true,
      corruptCounter = Some(counter)).collect()
    assert(rows.length == 1) // the good file's single block
    assert(counter.value == 1)

    intercept[org.apache.spark.SparkException] {
      FirehoseDecoder.blocks(spark, glob).collect()
    }
  }

  test("R17 observation reports event count during the action") {
    val dir = Files.createTempDirectory("bi_obs").toFile
    FirehoseFixture.writeStandard(dir)
    val (df, obs) = FirehoseDecoder.observed(
      FirehoseDecoder.decode(spark, dir.getAbsolutePath + "/*"))
    assert(df.count() == 14)
    val m = obs.get
    assert(m("events") == 14L)
    assert(m("files_approx").asInstanceOf[Long] >= 3L)
  }
}
