package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TagMining

/** FP-Growth contracts (tag/main.py:187-194) — not oracle-able, so the
  * correctness pins live here: hand-computed itemsets on a fixed corpus,
  * support monotonicity, and rule-metric sanity.
  */
class TagMiningSpec extends AnyFunSuite with SparkTestBase {

  test("hand-computed frequent itemsets on a fixed 5-transaction corpus") {
    val s = spark
    import s.implicits._
    // transactions: {a,b}, {a,b,c}, {a,c}, {a}, {b}
    val tx = Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "c"), Seq("a"), Seq("b"))
      .toDF("items")
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.4).setMinConfidence(0.5).fit(tx)
    val freq = model.freqItemsets.collect()
      .map(r => r.getSeq[String](0).sorted.mkString(",") -> r.getLong(1)).toMap
    // support >= 0.4 → freq >= 2
    assert(freq == Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "a,b" -> 2L, "a,c" -> 2L))
  }

  test("sequence patterns: hand-computed supports, skips allowed, order enforced") {
    val s = spark
    import s.implicits._
    // u1: a,b,c  u2: a,c  u3: b — minSupport 0.3 of 3 seqs → minCount 1?
    // No: sequencePatternsCore uses seqMinSupport = 0.3 → ceil(0.9) = 1,
    // too permissive to discriminate; so assert the interesting subsets:
    // a>c supported by u1 (skipping b) AND u2; c>a by nobody (order)
    val ev = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "c", 30L),
      (4L, 2L, "a", 10L), (5L, 2L, "c", 20L),
      (6L, 3L, "b", 10L))
      .toDF("event_id", "user_id", "event_type", "tsu")
    val got = TagMining.sequencePatternsCore(ev)
      .as[(String, Long)].collect().toMap
    assert(got("a>c") == 2L) // u1 skips b — non-contiguous match
    assert(got("a") == 2L && got("b") == 2L && got("c") == 2L)
    assert(got("a>b>c") == 1L)
    assert(!got.contains("c>a")) // order is enforced
    // support counts users once, not occurrences
    val ev2 = Seq((1L, 7L, "a", 1L), (2L, 7L, "a", 2L), (3L, 7L, "a", 3L))
      .toDF("event_id", "user_id", "event_type", "tsu")
    assert(TagMining.sequencePatternsCore(ev2)
      .as[(String, Long)].collect().toMap.apply("a") == 1L)
  }

  test("support monotonicity: freq(itemset) <= min freq of its items") {
    val itemsets = TagMining.freqItemsets(spark, sf).collect()
      .map(r => (r.getSeq[String](0), r.getLong(1)))
    val singles = itemsets.filter(_._1.length == 1)
      .map { case (is, f) => is.head -> f }.toMap
    itemsets.filter(_._1.length > 1).foreach { case (is, f) =>
      val bound = is.map(singles).min
      assert(f <= bound, s"itemset $is freq $f exceeds min-single $bound")
    }
  }

  test("all itemsets meet minSupport") {
    val n = TagMining.transactions(spark, sf).count()
    val minFreq = math.ceil(TagMining.minSupport * n).toLong
    val below = TagMining.freqItemsets(spark, sf).filter(col("freq") < minFreq).count()
    assert(below == 0)
  }

  test("tag co-occurrence: each pair's count equals the number of frequent " +
      "itemsets containing both tags") {
    val fi = TagMining.freqItemsets(spark, sf).select("items").collect()
      .map(_.getSeq[String](0))
    val co = TagMining.tagCooccurrence(spark, sf).collect()
    assert(co.nonEmpty)
    co.foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b, s"pairs must be canonical: ($a, $b)")
      val expected = fi.count(items => items.contains(a) && items.contains(b))
      assert(n == expected, s"($a, $b): got $n, itemset scan says $expected")
    }
    // completeness: every co-occurring top-tag pair is present
    val pairs = co.map(r => (r.getString(0), r.getString(1))).toSet
    val all = fi.flatMap(items =>
      for (i <- items.indices; j <- i + 1 until items.size)
        yield (items(i), items(j))).toSet
    assert(pairs == all) // lexicon has exactly 10 entities → top-10 is total
  }

  test("CJK column-name fixture: clean rules + unicode identifiers end-to-end") {
    val cleaned = TagMining.animeCleanCjk(spark, sf).collect()
    assert(cleaned.nonEmpty)
    // junk rows (想看/追剧 followers, 无 tags) are filtered
    val titles = cleaned.map(_.getString(0)).toSet
    assert(!titles.contains("葬送的芙莉莲")) // 追番人数 = 想看
    assert(!titles.contains("灵笼"))         // 标签 = 无
    // the 万-unit parse: 孤独摇滚 follows "183.4万" → 1,834,000.0
    val bocchi = cleaned.find(_.getString(0) == "孤独摇滚").get
    assert(bocchi.getDouble(1) == 1834000.0)
    // the CJK output identifier is carried verbatim through the plan
    assert(TagMining.animeCleanCjk(spark, sf).columns.head == "标题")
    val freq = TagMining.animeTagFreqCjk(spark, sf)
    assert(freq.columns.toSeq == Seq("标签", "n_titles"))
    // tag totals reconcile against the cleaned table's array sizes
    val nTagsTotal = cleaned.map(_.getLong(3)).sum
    assert(freq.collect().map(_.getLong(1)).sum == nTagsTotal)
  }

  test("association rules: confidence >= minConfidence, metrics in range, lift consistent") {
    val rules = TagMining.associationRules(spark, sf).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val conf = r.getDouble(2)
      val lift = r.getDouble(3)
      val support = r.getDouble(4)
      assert(conf >= TagMining.minConfidence && conf <= 1.0)
      assert(lift > 0.0)
      assert(support > 0.0 && support <= 1.0)
    }
  }
}
