package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV / JSON-lines source coverage: the two text formats a
  * replacement engine meets constantly beside parquet (the reference
  * itself ships newline-delimited JSON envelopes —
  * kinesis-to-humio.py:107-147; its decoded form IS a JSONL stream).
  *
  * Both readers take an EXPLICIT schema: at 100 TB schema inference
  * is a full extra pass over the data, so production pipelines pin
  * schemas (inference also types ambiguous columns differently per
  * engine, which would break the oracle contract for free).
  *
  * The fixture is deterministic synthetic content (1000 rows derived
  * from the row index), written once per JVM into java.io.tmpdir by
  * whichever side touches it first — scale-factor-invariant, so the
  * DuckDB oracle can read the very same file at a fixed path.
  */
object TextSources {
  val rows = 1000

  private def line(i: Int): (Long, String, String, String) =
    (i.toLong, s"name_${i % 97}",
      // Locale.ROOT: a comma-decimal default locale would corrupt both
      // fixture formats (5-field CSV rows, invalid JSON numbers).
      String.format(java.util.Locale.ROOT, "%.2f",
        Double.box((i * 37 % 10000) / 100.0)),
      s"tag${i % 5}")

  /** Write-once fixture at a stable path: content goes to a temp file
    * first and moves into place atomically, so a killed JVM can never
    * leave a truncated file that `exists()` would then trust forever. */
  private def fixture(name: String, content: => String): File =
    synchronized {
      val f = Paths.get(System.getProperty("java.io.tmpdir"), name).toFile
      if (!f.exists()) {
        val tmp = Files.createTempFile(f.toPath.getParent, name, ".tmp")
        Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
        try
          Files.move(tmp, f.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // lost a race with another JVM — its complete file wins
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
        }
      }
      f
    }

  /** One-file CSV fixture at a stable path. */
  def csvFixture: File = fixture("graft_source_fixture.csv", {
    val sb = new StringBuilder("id,name,val,tag\n")
    for (i <- 0 until rows) {
      val (id, n, v, t) = line(i)
      sb ++= s"$id,$n,$v,$t\n"
    }
    sb.toString
  })

  /** One-file JSONL fixture at a stable path (same logical rows). */
  def jsonlFixture: File = fixture("graft_source_fixture.jsonl", {
    val sb = new StringBuilder
    for (i <- 0 until rows) {
      val (id, n, v, t) = line(i)
      sb ++= s"""{"id":$id,"name":"$n","val":$v,"tag":"$t"}\n"""
    }
    sb.toString
  })

  private val schema = "id BIGINT, name STRING, val DOUBLE, tag STRING"

  def readCsv(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").schema(schema)
      .csv(csvFixture.getAbsolutePath)

  def readJsonl(spark: SparkSession): DataFrame =
    spark.read.schema(schema).json(jsonlFixture.getAbsolutePath)

  /** ORC round-trip of the SAME logical rows: Spark writes the
    * fixture rows as ORC once per JVM, reads them back through the
    * native ORC source. The DuckDB oracle reads the CSV twin of the
    * identical rows — so a green gate proves the ORC writer+reader
    * preserve every value (DuckDB has no ORC reader; the shared
    * logical fixture is what makes the format oracle-checkable
    * anyway). */
  def orcFixtureDir(spark: SparkSession): File = synchronized {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_source_fixture_orc").toFile
    if (!new File(dir, "_SUCCESS").exists()) {
      val data = (0 until rows).map { i =>
        val (id, n, v, t) = line(i)
        (id, n, v.toDouble, t)
      }
      spark.createDataFrame(data).toDF("id", "name", "val", "tag")
        .coalesce(1)
        .write.mode("overwrite").orc(dir.getAbsolutePath)
    }
    dir
  }

  def readOrc(spark: SparkSession): DataFrame =
    spark.read.schema(schema).orc(orcFixtureDir(spark).getAbsolutePath)
}
