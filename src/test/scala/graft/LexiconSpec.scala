package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Lexicon

/** U1 contract (SURVEY.md §2.3): ordered tiers, first hit wins,
  * case-insensitive substring match, null/empty → default 1.0
  * (hot/spark_energy.py:35-59 semantics).
  */
class LexiconSpec extends AnyFunSuite with SparkTestBase {

  private def scoreOf(v: String): Double = {
    val s = spark
    import s.implicits._
    Seq(Option(v)).toDF("event_type")
      .select(Lexicon.score(col("event_type")).as("s"))
      .collect()(0).getDouble(0)
  }

  test("tier weights: purchase=5, signup=3, click=2, error=0.5") {
    assert(scoreOf("purchase_item") == 5.0)
    assert(scoreOf("signup_form") == 3.0)
    assert(scoreOf("click_button") == 2.0)
    assert(scoreOf("error_500") == 0.5)
  }

  test("unknown type scores default 1.0") {
    assert(scoreOf("page_view") == 1.0)
  }

  test("null and empty score default 1.0") {
    assert(scoreOf(null) == 1.0)
    assert(scoreOf("") == 1.0)
  }

  test("first tier wins when multiple tiers match") {
    // purchase tier is checked before error tier
    assert(scoreOf("purchase_error") == 5.0)
    // signup before click
    assert(scoreOf("signup_click") == 3.0)
  }

  test("matching is case-insensitive") {
    assert(scoreOf("PURCHASE") == 5.0)
    assert(scoreOf("Click") == 2.0)
  }

  test("entity extraction: alias canonicalization + lexicon filter + dedup") {
    val s = spark
    import s.implicits._
    val out = Seq("spark joins the shuffle spark", "nothing here", "windows sorts")
      .toDF("text")
      .select(Lexicon.extractEntities(col("text")).as("e"))
      .collect()
      .map(_.getSeq[String](0))
    // order follows first occurrence in the text; duplicates collapse
    assert(out(0) == Seq("spark", "join", "shuffle"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("window", "sort"))
  }
}
