package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 TableProvider modelling the reference's REST standings
  * source (dags/driverstandings.py:66-68 `requests.get(url).json()`) as a
  * first-class Spark table: `spark.read.format("graft.sources.standings")
  * .option("season", "...")`. In this zero-egress environment the
  * "endpoint" serves a deterministic season table; a real deployment
  * would fetch in `PartitionReader.next` — the planner-facing contract
  * (schema, partitions, pushdown hooks) is identical.
  *
  * Partitioning mirrors how a REST source scales: one input partition per
  * page of the API (here: per constructor group), so a 1000-executor
  * cluster fans page fetches out instead of funnelling through the
  * driver.
  */
class StandingsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StandingsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StandingsTable(properties.getOrDefault("season", "2025"))
}

object StandingsSource {
  val schema: StructType = StructType(Seq(
    StructField("position", IntegerType, nullable = false),
    StructField("driver_id", StringType, nullable = false),
    StructField("constructor", StringType, nullable = false),
    StructField("points", IntegerType, nullable = false),
    StructField("wins", IntegerType, nullable = false),
    StructField("season", StringType, nullable = false)))

  /** Deterministic "API response", two pages. */
  val pages: Seq[Seq[(Int, String, String, Int, Int)]] = Seq(
    Seq((1, "max", "Red Bull", 255, 6), (3, "charles", "Ferrari", 180, 1)),
    Seq((2, "lando", "McLaren", 220, 4), (4, "lewis", "Ferrari", 160, 0)))
}

class StandingsTable(season: String) extends Table with SupportsRead {
  override def name(): String = s"standings_$season"
  override def schema(): StructType = StandingsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = StandingsSource.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          StandingsSource.pages.indices.map(i => StandingsPartition(i, season): InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new StandingsReaderFactory
      }
    }
}

case class StandingsPartition(page: Int, season: String) extends InputPartition

class StandingsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StandingsPartition]
    new PartitionReader[InternalRow] {
      private val rows = StandingsSource.pages(p.page).iterator
      private var current: (Int, String, String, Int, Int) = _
      override def next(): Boolean = {
        val has = rows.hasNext
        if (has) current = rows.next()
        has
      }
      override def get(): InternalRow = InternalRow(
        current._1, UTF8String.fromString(current._2),
        UTF8String.fromString(current._3), current._4, current._5,
        UTF8String.fromString(p.season))
      override def close(): Unit = ()
    }
  }
}
