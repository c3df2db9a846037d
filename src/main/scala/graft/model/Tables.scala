package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed accessors for the harness Parquet tables (TESTDATA.md).
  *
  * Schema-on-read is the Parquet footer schema; every reader is a plain
  * `spark.read.parquet` scan so Catalyst can push predicates/projections
  * into the Parquet row-group reader (`PushedFilters`/`ReadSchema`).
  * At 100 TB these become partitioned table scans; nothing here assumes
  * single-file layout.
  *
  * Harness timestamp columns have shipped in two physical flavors across
  * rounds — INT64 TIMESTAMP(NANOS) (readable only as raw longs via the
  * legacy `nanosAsLong` conf) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (which Spark 4 infers as TIMESTAMP_NTZ by default). Loaders normalize
  * BOTH to plain micros TimestampType: nanos-longs are divided down
  * explicitly, and NTZ inference is disabled so unadjusted micros read
  * as TimestampType with identical raw values — downstream operators
  * (`unix_micros`, watermarks, window()) all see one timestamp type
  * regardless of which generation wrote the files.
  */
object Tables {
  /** Timestamp-typed columns per table (stored as nanos in the files). */
  private val tsCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  /** Memoized per (session, dir, table): `spark.read.parquet` runs a footer
    * schema-inference job (~100-200 ms each), so re-deriving the same
    * immutable logical plan on every query call dominates short queries —
    * registering the 10-table SQL catalog cost more than TPC-H Q3 itself.
    * The cached value is an unexecuted plan; each use still scans fresh
    * row-group bytes, but the FILE LISTING is captured at first access:
    * callers must treat a testdata dir as immutable for the session's
    * lifetime (the harness dirs are read-only; anything mutable goes
    * through [[graft.ops.Sinks]] paths, never this cache). Entries for
    * stopped sessions are evicted on the next access so the map cannot
    * retain dead sessions/plans across a long-lived multi-session JVM.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, dir, name), _ => {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      tsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
        // Integer DIV, not `/` — Column `/` is double division, which loses
        // microsecond precision at epoch-nanos magnitude (~1.7e18).
        if (df.schema(c).dataType == LongType)
          df.withColumn(c, expr(s"timestamp_micros(`$c` DIV 1000)"))
        // Third physical flavor: Spark-WRITTEN unadjusted micros (e.g. the
        // ScaleFold soak corpus) carry footer row-metadata pinning the
        // column to TIMESTAMP_NTZ, which overrides the inference conf
        // above — normalize to TimestampType; under the UTC session
        // timezone every loader runs with, the cast preserves raw micros.
        else if (df.schema(c).dataType ==
            org.apache.spark.sql.types.TimestampNTZType)
          df.withColumn(c, col(c).cast("timestamp"))
        else df
      }
    })
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
