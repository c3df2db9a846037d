package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Expressions._

/** The seven reference pipelines recomposed from the ops layer — each a
  * single declarative Spark plan replacing an Airflow DAG's task chain
  * (extract → pandas row loops → Mongo write; SURVEY.md §3). Inputs are
  * landed tables shaped like the upstream fastf1/Ergast schemas
  * (SURVEY.md Appendix A); outputs are the reference's document shapes
  * (§1.2), produced set-wise: the per-row loops become projections,
  * broadcast joins, and collect_list aggregations.
  *
  * Write discipline is the caller's choice via graft.ops.Sinks:
  * upsertByKey (K1) for the five session pipelines, overwriteRefresh (K2)
  * for the two standings pipelines — matching dags/racedag.py:68-73 and
  * dags/driverstandings.py:82-85 respectively.
  */
object F1Pipelines {

  /** Race results doc (dags/racedag.py:39-61): one document per
    * (year, round) with a nested results array.
    */
  def raceResults(results: DataFrame, year: Int, round: Int,
                  eventName: String, eventFormat: String): DataFrame =
    results
      .groupBy()
      .agg(array_sort(collect_list(struct(
        col("TeamName").as("teamName"),
        col("HeadshotUrl").as("headshotURL"),
        col("Position").cast("int").as("position"),
        col("FullName").as("fullName"),
        col("ClassifiedPosition").as("classifiedPosition"),
        col("Points").cast("int").as("points"),
        col("GridPosition").cast("int").as("gridPosition")))).as("results"))
      .select(
        synthKey("_", lit(year), lit(round)).as("key"),
        lit(eventName).as("eventName"),
        lit(eventFormat).as("eventFormat"),
        col("results"))

  /** Qualifying results (dags/qualifyingdag.py:41-73): Q1-Q3 timedeltas
    * rendered "MM:SS.mmm" null-safely, nested under the event key.
    * Input carries Q1/Q2/Q3 as millis (nullable).
    */
  def qualifyingResults(results: DataFrame, year: Int, round: Int,
                        eventName: String): DataFrame =
    results
      .groupBy()
      .agg(array_sort(collect_list(struct(
        col("FullName").as("fullName"),
        col("TeamName").as("teamName"),
        col("HeadshotUrl").as("headshotUrl"),
        col("Position").cast("int").as("position"),
        formatLapTime(col("Q1")).as("q1"),
        formatLapTime(col("Q2")).as("q2"),
        formatLapTime(col("Q3")).as("q3")))).as("results"))
      .select(
        synthKey("_", lit(year), lit(round)).as("key"),
        lit(eventName).as("eventName"),
        col("results"))

  /** Practice laps (dags/practicedag.py:49-85): project, format lap time,
    * drop no-time laps (F4), enrich via broadcast driver lookup (N1).
    */
  def practiceLaps(laps: DataFrame, drivers: DataFrame,
                   year: Int, round: Int, sessionName: String,
                   eventFormat: String): DataFrame = {
    val enriched = laps
      .select(col("Driver"), col("LapTime"), col("Compound"),
        col("IsPersonalBest"), col("LapNumber"))
      .withColumn("lapTimeStr", formatLapTime(col("LapTime")))
      .na.drop(Seq("lapTimeStr"))
      .join(broadcast(drivers.select(
        col("Abbreviation").as("Driver"),
        col("FullName"), col("HeadshotUrl"))), Seq("Driver"), "left")
    enriched
      .groupBy()
      .agg(array_sort(collect_list(struct(
        col("Driver").as("driver"),
        col("HeadshotUrl").as("headshotUrl"),
        col("Compound").as("compound"),
        col("lapTimeStr").as("lapTime"),
        col("LapNumber").as("lapNumber"),
        col("IsPersonalBest").as("isPersonalBest"),
        col("FullName").as("fullName")))).as("laps"))
      .select(
        lit(year).as("year"), lit(round).as("round"),
        lit(sessionName).as("sessionName"), lit(eventFormat).as("eventFormat"),
        col("laps"))
  }

  /** Top speeds (dags/topspeed.py:48-83): the hand-rolled per-driver max
    * loop (O(drivers × laps) in the reference) as one hash aggregate.
    */
  def topSpeeds(laps: DataFrame, year: Int, round: Int,
                sessionName: String, eventFormat: String): DataFrame =
    laps
      .filter(!col("Deleted"))
      .groupBy(col("Driver"))
      .agg(max(col("SpeedST")).as("topSpeed"))
      .groupBy()
      .agg(array_sort(collect_list(struct(
        col("Driver").as("driver"),
        col("topSpeed")))).as("speeds"))
      .select(
        lit(year).as("year"), lit(round).as("round"),
        lit(sessionName).as("sessionName"), lit(eventFormat).as("eventFormat"),
        col("speeds"))

  /** Driver standings (dags/driverstandings.py:17-44): Ergast JSON →
    * flatten → typed rows with sentinel defaults and an ingest timestamp.
    */
  def driverStandings(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(payload).toDS())
      .select(explode(col("MRData.StandingsTable.StandingsLists")).as("sl"))
      .select(explode(col("sl.DriverStandings")).as("s"))
      .select(
        coalesce(col("s.Driver.permanentNumber").cast("int"), lit(0)).as("driverNumber"),
        element_at(col("s.Constructors"), 1).getField("name").as("constructorName"),
        coalesce(col("s.Driver.driverId"), lit("Unknown")).as("driverId"),
        coalesce(col("s.Driver.familyName"), lit("Unknown")).as("familyName"),
        coalesce(col("s.Driver.givenName"), lit("Unknown")).as("givenName"),
        coalesce(col("s.points").cast("int"), lit(0)).as("points"),
        positionOrZero(coalesce(col("s.position"), lit("Unknown"))).as("position"),
        coalesce(col("s.positionText"), lit("Unknown")).as("positionText"),
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
        coalesce(col("s.wins").cast("int"), lit(0)).as("wins"))
  }

  /** Constructor standings (dags/constructorstandings.py:17-38). */
  def constructorStandings(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(payload).toDS())
      .select(explode(col("MRData.StandingsTable.StandingsLists")).as("sl"))
      .select(explode(col("sl.ConstructorStandings")).as("s"))
      .select(
        coalesce(col("s.Constructor.constructorId"), lit("Unknown")).as("constructorId"),
        coalesce(col("s.Constructor.name"), lit("Unknown")).as("constructorName"),
        coalesce(col("s.points").cast("int"), lit(0)).as("points"),
        positionOrZero(coalesce(col("s.position"), lit("Unknown"))).as("position"),
        coalesce(col("s.positionText"), lit("Unknown")).as("positionText"),
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
        coalesce(col("s.wins").cast("int"), lit(0)).as("wins"))
  }

  /** Season schedule (dags/scheduledag.py:25-65): ISO date rendering with
    * NaT → "" (S7), key synthesis (S12), five session columns.
    */
  def schedule(events: DataFrame, year: Int): DataFrame = {
    val sessions = (1 to 5).flatMap { i =>
      Seq(col(s"Session$i").as(s"session$i"),
        isoTimestamp(col(s"Session${i}DateUtc")).as(s"session${i}DateUtc"))
    }
    events.select(
      Seq(
        concat_ws("-", col("RoundNumber").cast("string"), lit(year.toString)).as("key"),
        col("RoundNumber").cast("int").as("round"),
        col("Country").as("country"),
        col("OfficialEventName").as("officialEventName"),
        col("EventName").as("eventName"),
        col("EventFormat").as("eventFormat"),
        lit(year.toString).as("year")) ++ sessions: _*)
  }
}
