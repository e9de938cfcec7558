package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Extensions, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def gate: Seq[GateQuery] = Relational.all ++ Extensions.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    gate.find(_.name == "q15_star_join_agg").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gate.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    gate.collect { case GateQuery(n, _, Some(sql)) => n -> sql }.toMap
}
