package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality assertions — the reference's 16 dbt unique/not_null schema
  * tests (dbt_pipeline_demo/models/schema.yml; SURVEY.md §2.11) as cheap
  * DataFrame checks. Each check compiles to "violation count must be 0";
  * the query returns one row per check so the result is non-empty and
  * hash-comparable.
  */
object Quality {

  private[ops] def uniqueViolations(df: DataFrame, key: String, name: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  private[ops] def notNullViolations(df: DataFrame, c: Column, name: String): DataFrame =
    df.filter(c.isNull)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** All checks as one unioned result: check_name, n_violations. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val part     = Tables.part(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders   = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val checks = Seq(
      uniqueViolations(part, "p_partkey", "part_pk_unique"),
      uniqueViolations(supplier, "s_suppkey", "supplier_pk_unique"),
      uniqueViolations(customer, "c_custkey", "customer_pk_unique"),
      uniqueViolations(orders, "o_orderkey", "orders_pk_unique"),
      notNullViolations(part, col("p_partkey"), "part_pk_not_null"),
      notNullViolations(supplier, col("s_suppkey"), "supplier_pk_not_null"),
      notNullViolations(lineitem, col("l_orderkey"), "lineitem_orderkey_not_null"),
      notNullViolations(lineitem, col("l_partkey"), "lineitem_partkey_not_null"),
      notNullViolations(orders, col("o_custkey"), "orders_custkey_not_null"))
    checks.reduce(_ unionByName _).orderBy("check_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> (dqChecks _))

  val oracle: Map[String, String] = Map(
    "dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'part_pk_unique' AS check_name,
        |    (SELECT COUNT(*) FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING COUNT(*) > 1)) AS n_violations
        |  UNION ALL SELECT 'supplier_pk_unique',
        |    (SELECT COUNT(*) FROM (SELECT s_suppkey FROM supplier GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'customer_pk_unique',
        |    (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'orders_pk_unique',
        |    (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1))
        |  UNION ALL SELECT 'part_pk_not_null',
        |    (SELECT COUNT(*) FROM part WHERE p_partkey IS NULL)
        |  UNION ALL SELECT 'supplier_pk_not_null',
        |    (SELECT COUNT(*) FROM supplier WHERE s_suppkey IS NULL)
        |  UNION ALL SELECT 'lineitem_orderkey_not_null',
        |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
        |  UNION ALL SELECT 'lineitem_partkey_not_null',
        |    (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL)
        |  UNION ALL SELECT 'orders_custkey_not_null',
        |    (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
        |) ORDER BY check_name""".stripMargin)
}
