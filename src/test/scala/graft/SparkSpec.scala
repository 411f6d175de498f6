package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the test suite. One session per JVM
  * (tests fork once); small shuffle-partition count keeps tiny-fixture
  * jobs fast. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map(v => if (v == null) "" else v.toString))
      .sortBy(_.mkString("|")).toSeq

  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.toSeq === b.columns.sorted.toSeq)
    val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col).toSeq
    assert(sortedRows(a.select(cols: _*)) === sortedRows(b.select(cols: _*)))
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
