package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{SimHash64, TextFunctions}

/** The SparkSessionExtensions payload: graft's custom expressions must
  * be reachable from SQL text, not just the Column API, and both routes
  * must agree.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("simhash64 is callable from SQL and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT simhash64(array('spark', 'shuffle', 'join')) AS h")
      .collect()(0).getLong(0)
    val s = spark
    import s.implicits._
    val viaColumn = Seq("spark shuffle join").toDF("text")
      .select(SimHash64(TextFunctions.tokens(col("text"))).as("h"))
      .collect()(0).getLong(0)
    assert(viaSql == viaColumn)
  }

  test("dot_product is callable from SQL with correct math") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("dot_product rejects non-double arrays at analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.contains("array<double>") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
