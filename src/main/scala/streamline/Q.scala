package streamline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query capability (SURVEY.md §2): the Spark implementation
  * plus (unless the op is approximate / semantics-only) its DuckDB oracle
  * SQL. Modules expose `val all: Seq[Q]`; graft.SparkEntry concatenates
  * them into the driver contract maps.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
            sql: String): Q = Q(name, fn, Some(sql))
  def noOracle(name: String,
               fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, None)
}
