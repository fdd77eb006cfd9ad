package graft

/** Typed row models for the engine's tables (SURVEY.md §1.3: case-class
  * `Encoder`s at API boundaries for compile-time safety; `DataFrame`
  * internally where schema is dynamic). Field names and types mirror
  * Tables.*Schema exactly — `Tables.typed*` loaders pair a declared-
  * schema scan with `.as[T]`, so STRUCTURAL drift (missing/renamed/
  * retyped column) fails at analysis. Nullability is a runtime
  * property: columns the engine itself null-guards (`events.ts`,
  * see EnergyPipeline/Sessionization filters) are `Option`-typed here;
  * a null in any other primitive field deserializes to an NPE, which
  * is the intended loud failure for data violating the contract.
  */
package object model

package model {

  case class Event(
      event_id: Long, ts: Option[Long], user_id: Long,
      event_type: String, value: Double, props: String)

  case class Document(
      doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)
}
