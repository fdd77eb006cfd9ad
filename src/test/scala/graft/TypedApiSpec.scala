package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** Typed Dataset surface: case-class rows round-trip the declared
  * schemas, and typed transformations agree with the DataFrame path.
  */
class TypedApiSpec extends AnyFunSuite with SparkTestBase {

  test("typed loaders materialize case-class rows for every modeled table") {
    assert(Tables.typedEvents(spark, sf).head().event_id >= 0L)
    assert(Tables.typedDocuments(spark, sf).head().text != null)
    assert(Tables.typedEmbeddings(spark, sf).head().embedding.length == 64)
    assert(Tables.typedCustomer(spark, sf).head().c_name.nonEmpty)
    assert(Tables.typedOrders(spark, sf).head().o_orderstatus.nonEmpty)
    assert(Tables.typedLineitem(spark, sf).head().l_quantity >= 0.0)
  }

  test("typed filter+map agrees with the DataFrame equivalent") {
    val s = spark
    import s.implicits._
    val typed = Tables.typedOrders(spark, sf)
      .filter(o => o.o_orderstatus == "F")
      .map(o => o.o_totalprice)
      .collect().sorted.toSeq
    val untyped = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      .select("o_totalprice")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(typed == untyped)
  }
}
