package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage: the engine reads and writes the standard
  * file formats plus the custom DSv2 connector.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.5))

  private def roundTrip(fmt: String): Unit = {
    val path = s"target/tmp/src_$fmt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val df = sample.toDF("id", "name", "score")
    df.write.format(fmt).mode("overwrite")
      .option("header", "true") // ignored by non-csv formats
      .save(path)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true")
      .load(path)
      .select(col("id").cast("long"), col("name"), col("score").cast("double"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(back == sample.sortBy(_._1), s"round trip through $fmt")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(roundTrip("csv"))

  test("partitioned write prunes partitions on read") {
    val path = "target/tmp/src_partitioned"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    graft.model.Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("day") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    val n = pruned.count()
    assert(n > 0)
    // partition filter must not survive as a data filter: pruning happened
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("day=")))
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val path = "target/tmp/src_evolve"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$path/part1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$path/part2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/part1", s"$path/part2")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.orderBy($"id")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSeq
    assert(rows == Seq((1L, None), (2L, Some(9.5))))
  }

  test("parquet zstd compression round-trips") {
    val path = "target/tmp/src_zstd"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    sample.toDF("id", "name", "score")
      .write.option("compression", "zstd").parquet(path)
    assert(new java.io.File(path).listFiles().exists(_.getName.contains("zstd")))
    assert(spark.read.parquet(path).count() == sample.size)
  }

  test("compactParquet shrinks the file count and preserves content") {
    val path = "target/tmp/src_compact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val events = graft.model.Tables.events(spark, sf)
    events.repartition(16).write.parquet(path)
    def nFiles = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = nFiles
    val expected = spark.read.parquet(path).count()
    graft.ops.Sinks.compactParquet(spark, path, targetFiles = 2)
    assert(nFiles == 2 && before == 16)
    assert(spark.read.parquet(path).count() == expected)
  }

  test("malformed CSV rows: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    val path = "target/tmp/sources_spec_malformed"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    new java.io.File(path).mkdirs()
    // row 3 has more tokens than the schema — unambiguously malformed
    // (a failed numeric cast alone nulls the field instead, by design)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/part.csv"),
      "1,alpha\n2,beta\n3,gamma,EXTRA,TOKENS\n4,delta\n")
    val schema = "id INT, name STRING, _corrupt_record STRING"

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path).cache()
    assert(permissive.count() == 4)
    val bad = permissive.filter($"_corrupt_record".isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").startsWith("3,gamma"))
    permissive.unpersist()

    // NOTE: a bare count() on a DROPMALFORMED csv scan counts ALL lines —
    // column pruning skips parsing, so malformed rows are never detected
    // (the documented csv column-pruning trap). Materialize the columns.
    val dropped = spark.read.schema("id INT, name STRING")
      .option("mode", "DROPMALFORMED").csv(path)
      .select($"id", $"name").collect()
    assert(dropped.length == 3)
    assert(dropped.map(_.getAs[Int]("id")).sum == 7)

    val failfast = spark.read.schema("id INT, name STRING")
      .option("mode", "FAILFAST").csv(path)
    val e = intercept[org.apache.spark.SparkException] { failfast.collect() }
    assert(e.getMessage.contains("MALFORMED_RECORD_IN_PARSING") ||
      e.getCause != null)
  }

  test("DSv2 standings source plans one partition per API page") {
    val df = spark.read.format("graft.sources.StandingsSource")
      .option("season", "2031").load()
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.orderBy($"position").collect()
    assert(rows.length == 4)
    assert(rows.head.getAs[String]("season") == "2031")
    assert(rows.head.getAs[String]("driver_id") == "max")
  }
}
