package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of per-family registries (graft.queries.*); each
  * key pairs with DuckDB-runnable ANSI SQL in `oracleSql` (keys without SQL
  * get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped: revenue per urgent open order — scan+filter+join+agg
    * +topk in one plan (broadcastable dims, partial aggregation, top-k via
    * TakeOrderedAndProject).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val orders = graft.model.Tables.orders(spark, d)
    val lineitem = graft.model.Tables.lineitem(spark, d)
    lineitem
      .join(orders.filter(col("o_orderstatus") === "O"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RefOps.registry ++
      graft.queries.Relational.registry ++
      graft.queries.LlmOps.registry ++
      graft.queries.StreamShapes.registry ++
      graft.queries.ExtOps.registry ++
      graft.queries.CurateOps.registry ++
      graft.queries.InsightOps.registry ++
      graft.queries.StatOps.registry ++
      graft.queries.SeriesOps.registry ++
      graft.queries.FeatureOps.registry ++
      graft.queries.EngageOps.registry ++
      graft.queries.GraphOps.registry ++
      graft.queries.SqlSurface.registry

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RefOps.oracle ++
      graft.queries.Relational.oracle ++
      graft.queries.LlmOps.oracle ++
      graft.queries.StreamShapes.oracle ++
      graft.queries.ExtOps.oracle ++
      graft.queries.CurateOps.oracle ++
      graft.queries.InsightOps.oracle ++
      graft.queries.StatOps.oracle ++
      graft.queries.SeriesOps.oracle ++
      graft.queries.FeatureOps.oracle ++
      graft.queries.EngageOps.oracle ++
      graft.queries.GraphOps.oracle ++
      graft.queries.SqlSurface.oracle
}
