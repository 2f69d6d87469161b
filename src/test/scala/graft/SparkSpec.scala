package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM via Test/fork; the
  * session is created once and reused — spinning a session per suite
  * would dominate test wall-clock).
  */
object SparkSpec {
  lazy val spark: SparkSession = Engine.local(4)
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types.StructType

  /** Build a small DataFrame from rows + DDL schema. */
  def df(ddl: String, rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(ddl))

  /** Rows as a set of per-column Seq (order-insensitive compare). */
  def rowSet(d: DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq).toSet
}
