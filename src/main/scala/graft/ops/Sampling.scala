package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic corpus sampling — the curation ops a training-data
  * pipeline runs before every mix change: stratified downsampling to a
  * per-language rate and a reproducible train/eval split.
  *
  * Randomness is CONTENT-FREE and SEED-STABLE: the decision for a doc is
  * a pure function of (doc_id, salt) via an md5 hex prefix, so the same
  * doc lands on the same side of every split on every run, on any
  * cluster layout — `df.sample()` (partition-RNG) cannot promise that,
  * and a promotion/re-partition would silently reshuffle the sample.
  * Rates quantize to 1/16ths (first hex nibble): coarse but portable —
  * the identical expression runs in any engine with md5, which is what
  * makes the result oracle-able bit-for-bit.
  *
  * 100 TB: one codegen'd projection + filter, no shuffle, no state; the
  * filter pushes nothing to the scan (the hash is computed per row) but
  * prunes to the projected columns only.
  */
object Sampling {

  /** First hex nibble of md5(doc_id || salt) as 0-15. */
  private def nibble(salt: String): Column = nibbleOf(col("doc_id"), salt)

  /** The one hash-decision primitive: first hex nibble (0-15) of
    * md5(key || salt) — q58/q59/q87's doc-level decisions and q144's
    * user-level fold assignment all route through here.
    */
  private[graft] def nibbleOf(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))
      .cast("binary")), 1, 1), 16, 10).cast("int")

  /** Per-language keep-rates in 16ths: en is the bulk language (downsample
    * hardest), zh is scarce (keep half), long-tail languages keep 2/16.
    */
  val rateSixteenths: Map[String, Int] = Map("en" -> 4, "zh" -> 8)
  val defaultSixteenths = 2

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val threshold = rateSixteenths.foldLeft(lit(defaultSixteenths)) {
      case (acc, (lang, r)) => when(col("lang") === lang, r).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), nibble(":strat").as("h"))
      .filter(col("h") < threshold)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** The 14/16-train / 2/16-eval assignment as a column over any frame
    * with `doc_id` — the single definition q59 and the q87
    * decontamination consumer both evaluate, so the two can never
    * disagree about which side a doc landed on.
    */
  private[graft] def splitExpr: Column =
    when(nibble(":split") < 14, "train").otherwise("eval")

  /** Deterministic 14/16 train, 2/16 eval assignment (salted separately
    * from the sampler so the two decisions are independent).
    */
  def trainEvalSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), splitExpr.as("split"))
      .orderBy("doc_id")

  /** q299 — LEAKAGE-SAFE TRAIN/EVAL SPLIT: q59's row-level hash split
    * applied naively can put two COPIES of the same document on
    * opposite sides — the eval set then "tests" on memorized training
    * text, the classic split-leakage bug dedup reports exist to
    * prevent (q144 fixes it at the user grain for events; this is the
    * document grain over content identity). The split is keyed on the
    * exact-duplicate GROUP representative (min doc_id of the md5(text)
    * group, q50's identity), so a group can never straddle by
    * construction — and because the rep of a singleton group is the
    * doc itself under the SAME ':split' salt, the assignment agrees
    * with q59 everywhere except inside duplicate groups, which is
    * precisely the set q59 gets wrong. The audit side quantifies the
    * averted leakage: `naive_straddled` marks groups whose members
    * land on BOTH sides under the row-level rule — exact, recomputed
    * by the oracle, the number a curation postmortem reports.
    *
    * Scale: one hash agg to the distinct-content grain and one
    * equi-join back (the q50 collapse shape); both split decisions
    * are zero-shuffle md5-nibble projections (q58/q59's rule).
    */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame =
    leakageSafeSplitCore(Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — fixture seam for the spec. */
  private[graft] def leakageSafeSplitCore(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("th"),
        (nibble(":split") < 14).as("naive_train"))
    val groups = d.groupBy("th").agg(
      min("doc_id").as("rep_id"),
      count(lit(1)).as("group_n"),
      countDistinct("naive_train").as("naive_sides"))
    d.join(groups, "th")
      .select(col("doc_id"), col("rep_id"), col("group_n"),
        when(nibbleOf(col("rep_id"), ":split") < 14, "train")
          .otherwise("eval").as("split"),
        (col("naive_sides") > 1L).as("naive_straddled"))
      .orderBy("doc_id")
  }

  /** q144 fold count — 4 divides the 16 nibble values exactly, so the
    * folds are uniform by construction (a `mod 5` would bias fold 0).
    */
  val kFolds = 4

  /** q144 — GROUP k-fold assignment: every event of a user lands in the
    * same fold (fold = user-level hash), the property that makes
    * cross-validation leakage-free — a row-level split (q59's shape,
    * applied naively to events) would put one user's behavior in both
    * train and test and leak identity features. The output is the fold
    * audit: per (fold, event_type), events and distinct users. Group
    * disjointness is structural (the fold is a pure function of
    * user_id), so Σ n_users over folds for a type = global distinct
    * users — the spec pins it.
    *
    * Scale: the fold decision is a zero-shuffle projection (same as
    * q58/q59); the audit is one hash agg to a |folds|×|types| cell
    * domain with an exact distinct per cell.
    */
  def groupKFold(spark: SparkSession, dir: String): DataFrame =
    groupKFoldCore(Tables.eventsMicros(spark, dir))

  private[graft] def groupKFoldCore(ev: DataFrame): DataFrame =
    ev.select(
        (nibbleOf(col("user_id"), ":fold") / lit(16 / kFolds)).cast("long")
          .as("fold"),
        col("event_type"), col("user_id"))
      .groupBy("fold", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("fold", "event_type")

  val negOversample = 8
  val negPerUser = 4

  /** q181 — DETERMINISTIC NEGATIVE SAMPLING: the contrastive-training
    * pairing op — for every user with purchases, sample items the user
    * did NOT buy as training negatives. The sample is a pure function
    * of (user, slot): candidate item = five md5 hex nibbles of
    * `user:i:neg` mod the item-key domain (data-derived single-row
    * broadcast), so the same user gets the same negatives on every
    * run, any cluster layout — the q58/q59 seed-stability contract,
    * which `df.sample()`'s partition RNG cannot give and training-data
    * lineage requires. Accidental positives are removed by ONE
    * anti-join against the positive pairs (the only data-sized
    * shuffle); oversampling (8 candidates for 4 keeps) absorbs the
    * removals, per-user dedup keeps the earliest slot, and the keep
    * rank is a window over ≤8 rows per user — linear end to end at
    * 10⁹ users. The oracle replays the identical arithmetic in DuckDB
    * (nibble-compose, same modulus, same tie-break), so the sample is
    * verified bit-for-bit, not statistically.
    */
  def negativeSamples(s: SparkSession, d: String): DataFrame = {
    val pos = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .distinct()
    // item-key domain (contiguous 0..P-1): single-row broadcast, the
    // sanctioned boundary pattern
    val itemDomain = Tables.part(s, d)
      .agg((max("p_partkey") + 1).as("n_items"))
    val cand = pos.select("user_id").distinct()
      .crossJoin(broadcast(itemDomain))
      .select(col("user_id"), col("n_items"),
        explode(sequence(lit(0), lit(negOversample - 1))).as("i"))
      .select(col("user_id"), col("i").cast("long").as("i"),
        (conv(substring(md5(concat(col("user_id").cast("string"), lit(":"),
          col("i").cast("string"), lit(":neg")).cast("binary")), 1, 5),
          16, 10).cast("long") % col("n_items")).as("item_id"))
    cand.join(pos, Seq("user_id", "item_id"), "left_anti")
      .groupBy("user_id", "item_id").agg(min("i").as("i"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("i", "item_id")))
      .filter(col("rk") <= negPerUser)
      .select(col("user_id"), col("item_id"), col("i"))
      .orderBy("user_id", "i", "item_id")
  }

  val prioritySampleK = 200

  /** q184 — DETERMINISTIC WEIGHTED SAMPLING (priority sampling,
    * Duffield–Lund–Thorup, CACM 2007): draw a fixed-size sample of
    * orders where selection probability scales with order value — the
    * curation op for value-weighted corpus mixes (sample documents
    * proportional to a quality weight) and weighted sketches of spend.
    * Each item gets priority = w·2³² div u, u a 32-bit uniform derived
    * from md5(key) (the q58 seed-stability contract: same item, same
    * priority, every run, any layout); the sample is the top-k by
    * priority. Everything is 64-bit integer arithmetic — weights are
    * floor(dollars)+1 ≤ ~5·10⁵, so w·2³² ≤ 2.1·10¹⁸ < 2⁶³ (ANSI-safe
    * headroom documented, not assumed) — and both engines truncate
    * integer division identically, so the oracle re-derives the
    * IDENTICAL sample bit-for-bit, not a statistical approximation.
    *
    * 100 TB: one codegen'd projection computes priorities, then ONE
    * TakeOrderedAndProject (per-partition top-k, k-row merge on the
    * driver) — no global sort, no shuffle of the data. k rows of state
    * per partition regardless of input size.
    */
  /** The q184 priority projection — shared with q326's estimator. */
  private def orderPriorities(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("floor(o_totalprice) + 1L").as("w"),
        (conv(substring(md5(concat(col("o_orderkey").cast("string"),
          lit(":wsamp")).cast("binary")), 1, 8), 16, 10)
          .cast("long") + 1L).as("u"))
      .select(col("o_orderkey"), col("w"),
        expr("(w * 4294967296L) div u").as("priority"))

  def weightedPrioritySample(s: SparkSession, d: String): DataFrame =
    orderPriorities(s, d)
      .orderBy(col("priority").desc, col("o_orderkey"))
      .limit(prioritySampleK)

  /** q326 — PRIORITY-SAMPLE WEIGHT ESTIMATES: the second half of
    * Duffield–Lund–Thorup that q184 leaves on the table. A weighted
    * sample is only useful downstream if totals computed FROM it are
    * unbiased; DLT's estimator is ŵᵢ = max(wᵢ, τ) for each sampled
    * item, τ = the (k+1)-th largest priority, and E[Σ ŵᵢ] = Σ w over
    * the whole population — the property that lets a curation pipeline
    * quote corpus-level token/byte masses from a k-row sample. Every
    * quantity here is the same exact 64-bit integer arithmetic as
    * q184 (priority = w·2³² div u ≈ w/u shares w's units, so
    * max(w, τ) is well-typed), so the oracle re-derives the sample,
    * the threshold and every estimate bit-for-bit. Output: rank,
    * item, weight, priority, ŵ.
    *
    * 100 TB: one codegen'd projection + ONE TakeOrderedAndProject of
    * k+1 rows; τ is a single-row broadcast into the k output rows
    * (the sanctioned boundary-broadcast pattern). The unbiasedness is
    * spec-checked against the population total on the fixture.
    */
  def priorityEstimates(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = prioritySampleK
    val top = orderPriorities(s, d)
      .orderBy(col("priority").desc, col("o_orderkey"))
      .limit(k + 1)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("priority").desc, col("o_orderkey")))
        .cast("long"))
    val tau = top.filter(col("rank") === (k + 1).toLong)
      .agg(coalesce(max("priority"), lit(0L)).as("tau"))
    top.filter(col("rank") <= k.toLong)
      .crossJoin(broadcast(tau))
      .select(col("rank"), col("o_orderkey"), col("w"), col("priority"),
        greatest(col("w"), col("tau")).as("w_est"))
      .orderBy("rank")
  }

  val bootstrapReplicates = 16

  /** q193 — POISSON BOOTSTRAP in one pass: B resample replicates of
    * mean order value, computed WITHOUT materializing a single
    * resample. The classical bootstrap draws n rows with replacement B
    * times — O(B·n) and unshardable; the Poisson bootstrap replaces
    * each row's multiplicity with an independent Poisson(1) weight, so
    * every replicate is just a weighted sum and all B of them fold
    * into ONE scan with B conditional-sum pairs (stacked back to rows
    * afterwards) — the standard way to put error bars on a 100 TB
    * aggregate. Weights are a pure function of (key, replicate) via
    * the q58 md5-nibble primitive, quantized to 16ths
    * (P(0)=P(1)=6/16, P(2)=3/16, P(3)=1/16 vs Poisson(1)'s
    * .368/.368/.184/.080 — the closest 16th-lattice fit, documented
    * not hidden), so the oracle re-derives every replicate
    * bit-for-bit. Money in exact integer cents; replicate means are
    * one truncating division, DECIMAL-widened sums.
    */
  def poissonBootstrap(s: SparkSession, d: String): DataFrame = {
    val B = bootstrapReplicates
    val base = Tables.orders(s, d).select(col("o_orderkey"),
      expr("floor(o_totalprice * 100.0D)").as("cents"))
    val weighted = (0 until B).foldLeft(base) { (df, b) =>
      df.withColumn(s"w_$b",
        when(nibbleOf(col("o_orderkey"), s":$b:boot") < 6, 0L)
          .when(nibbleOf(col("o_orderkey"), s":$b:boot") < 12, 1L)
          .when(nibbleOf(col("o_orderkey"), s":$b:boot") < 15, 2L)
          .otherwise(3L))
    }
    val aggCols = (0 until B).flatMap(b => Seq(
      sum(col(s"w_$b")).as(s"n_$b"),
      expr(s"sum(cast(cents as decimal(38,0)) * w_$b)").as(s"s_$b")))
    val agg = weighted.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = (0 until B)
      .map(b => s"${b}L, n_$b, s_$b").mkString(", ")
    agg.select(expr(
        s"stack($B, $stackArgs) AS (replicate, n_eff, s)"))
      .select(col("replicate"), col("n_eff"),
        expr("s div nullif(n_eff, 0)").as("mean_cents"))
      .orderBy("replicate")
  }

  // ---- q255: token-budget apportionment --------------------------------

  /** q255 target budget (tokens). */
  val apportionBudget = 100000L

  /** q255 — LARGEST-REMAINDER APPORTIONMENT of a token budget across
    * languages (Hamilton's method): the integer step after q199's
    * mixture proportions — a training mix ultimately needs WHOLE token
    * budgets per source that sum EXACTLY to the target, and naive
    * per-group rounding drifts by up to ±|groups|/2. Each language
    * gets ⌊T·w/W⌋, then the T−Σ⌊⌋ leftover goes +1 each to the largest
    * remainders (tie → lang asc, deterministic). All integer: quota
    * products T·w stay in BIGINT to W ≈ 9·10¹⁸/T tokens.
    *
    * Scale: one corpus-scale token-count agg (map-side partials); the
    * apportionment itself is a window over the LANGUAGE frame —
    * single-partition but |langs|-sized by construction (the q238
    * "small-by-construction" class, asserted in the spec).
    */
  def tokenApportionment(spark: SparkSession, dir: String): DataFrame =
    apportionCore(
      Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .groupBy("lang")
        .agg(sum(graft.expr.TextFunctions.tokenCount(col("text"))
          .cast("long")).as("w")),
      apportionBudget)

  /** Core over any (lang, w) frame; fixture seam for the spec. */
  private[graft] def apportionCore(weights: DataFrame, t: Long): DataFrame = {
    val tot = weights.agg(sum("w").as("tw"))
    val base = weights.crossJoin(broadcast(tot))
      .withColumn("floor_alloc", expr(s"$t * w div tw"))
      .withColumn("rem", expr(s"($t * w) % tw"))
    val byRem = Window.orderBy(desc("rem"), asc("lang"))
    val leftW = Window.partitionBy(lit(1))
    base
      .withColumn("leftover", lit(t) - sum("floor_alloc").over(leftW))
      .withColumn("rk", row_number().over(byRem).cast("long"))
      .withColumn("alloc",
        col("floor_alloc") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L))
      .select(col("lang"), col("w").as("n_tokens"), col("floor_alloc"),
        col("rem"), col("alloc"))
      .orderBy("lang")
  }

  /** q309 sampling budget (rows) and the α = 0.5 temperature. */
  private[graft] val tempBudget = 1000000L

  /** q309 — TEMPERATURE-SCALED LANGUAGE MIXTURE (the exponent-smoothed
    * multilingual sampling rule of multilingual-BERT / XLM-R: sample
    * language ℓ ∝ p_ℓ^α, α = 0.5, so head languages are downweighted
    * and the tail is boosted without ever inverting the order): per
    * language, the corpus token share in exact ppm, the α = 0.5
    * temperature weight w_ℓ = ⌊10⁶·√share⌋ (computed as
    * floor(sqrt(share_ppm·10⁶)) — the argument is an exact integer
    * ≤ 10¹² so the IEEE double sqrt+floor is bit-identical in both
    * engines; the ONE float op, same discipline as q298's z), and the
    * integer apportionment of a [[tempBudget]]-row sampling budget
    * over the temperature weights by the exact largest-remainder rule
    * (q255's oracle-proven kernel, reused verbatim).
    *
    * Scale: one hash agg to the language grain (bounded vocabulary),
    * then single-row broadcasts — nothing after the first agg is
    * data-scaled.
    */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame =
    temperatureMixtureCore(Tables.documents(spark, dir))

  /** Core over any (lang, text) frame — fixture seam. */
  private[graft] def temperatureMixtureCore(docs: DataFrame): DataFrame = {
    val byLang = docs.filter(col("text").isNotNull)
      .groupBy("lang")
      .agg(sum(graft.expr.TextFunctions.tokenCount(col("text"))
        .cast("long")).as("n_tokens"))
    // decimal(38,0) before the ×10⁶, like q303's slope_ppm: the oracle
    // computes this product in HUGEINT, and a 64-bit multiply silently
    // wraps beyond ~9.2e12 corpus tokens — exactly the scale this
    // mixture is for (r14 ADVICE)
    val shares = byLang
      .crossJoin(broadcast(byLang.agg(sum("n_tokens").as("tot"))))
      .select(col("lang"), col("n_tokens"),
        expr("""cast(cast(n_tokens as decimal(38,0)) * 1000000 div tot
                as bigint)""").as("share_ppm"),
        expr("""cast(floor(sqrt(cast(cast(n_tokens as decimal(38,0))
                * 1000000 div tot as double) * 1000000.0D)) as bigint)""")
          .as("w"))
    apportionCore(shares.select("lang", "w"), tempBudget)
      .withColumnRenamed("n_tokens", "w_ppm")
      .join(shares.select("lang", "n_tokens", "share_ppm"), Seq("lang"))
      .select("lang", "n_tokens", "share_ppm", "w_ppm", "floor_alloc",
        "rem", "alloc")
      .orderBy("lang")
  }

  // ---- q252: rendezvous (HRW) sharding ---------------------------------

  /** q252 shard counts before/after the resize. */
  val hrwShards = 8
  val hrwShardsAfter = 9

  /** q252 — RENDEZVOUS-HASH SHARD ASSIGNMENT + RESIZE AUDIT: each doc
    * goes to argmax over shards s of hash(doc, s) (highest random
    * weight — the consistent-placement rule behind distributed caches
    * and shard routers), computed for S=8 and S=9 in ONE pass; the
    * audit reports, per post-resize shard, how many docs it holds and
    * how many MOVED. HRW's defining property — only docs whose argmax
    * IS the new shard move, ≈ 1/(S+1) of the corpus, nothing
    * reshuffles among survivors — falls out as: every `moved` row
    * lands in shard S (SamplingSpec pins it).
    *
    * Scale: pure map-side projection (an S-element array argmax per
    * row — no shuffle at all until the 9-row count agg); the argmax is
    * `array_max` over (weight, shard) structs, ties impossible at
    * 48-bit md5 weights but deterministically broken toward the higher
    * shard id on both engines anyway.
    */
  def rendezvousSharding(spark: SparkSession, dir: String): DataFrame = {
    def w(s: Int) =
      expr("cast(conv(substring(md5(cast(concat(cast(doc_id as string), " +
        s"':hrw:$s') as binary)), 1, 12), 16, 10) as bigint)")
    def pick(n: Int) = array_max(array((0 until n).map(s =>
      struct(w(s).as("w"), lit(s.toLong).as("s"))): _*)).getField("s")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        pick(hrwShards).as("shard_before"),
        pick(hrwShardsAfter).as("shard_after"))
      .groupBy("shard_after")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_before") =!= col("shard_after"), 1L)
          .otherwise(0L)).as("n_moved"))
      .orderBy("shard_after")
  }

  type Q = (SparkSession, String) => DataFrame

  /** q199 — DATASET MIXTURE REWEIGHTING: compute the per-(lang, source)
    * keep rates that rebalance the corpus to a target language mixture
    * (uniform across observed languages; within a language every source
    * keeps the same rate) — the planning step of pretraining-data
    * curation ("we want 1/n_langs of the final tokens from each
    * language") that q58's fixed-rate stratified sampler then EXECUTES.
    * Rates are exact integer ppm capped at 10⁶ (a scarce language is
    * never upsampled, it just keeps everything), and expected surviving
    * rows per cell come from the same integral arithmetic, so the whole
    * plan is re-derivable by any engine.
    *
    * Scale: one hash agg collapses the corpus to (lang, source) cells;
    * language totals and the language count are window sums OVER THE
    * CELL FRAME (dimension-sized, never row-sized). Nothing touches
    * document rows twice — the plan IS the audit table a curation run
    * reviews before launching the sampler.
    */
  def mixtureReweight(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n_rows"))
      .withColumn("lang_rows",
        sum("n_rows").over(Window.partitionBy("lang")))
      .withColumn("total_rows",
        sum("n_rows").over(Window.partitionBy()))
      .withColumn("n_langs",
        size(collect_set("lang").over(Window.partitionBy())).cast("long"))
      // target rows per lang = total div n_langs; keep_ppm capped at 10⁶
      // (never upsample). DECIMAL(38,0): rows·10⁶ wraps BIGINT past ~9e12.
      .withColumn("keep_ppm",
        least(lit(1000000L), expr(
          """CAST(CAST(total_rows div n_langs AS DECIMAL(38,0)) * 1000000
               div lang_rows AS BIGINT)""")))
      .withColumn("expected_rows",
        expr("CAST(CAST(n_rows AS DECIMAL(38,0)) * keep_ppm div 1000000" +
          " AS BIGINT)"))
      .select("lang", "source", "n_rows", "keep_ppm", "expected_rows")
      .orderBy("lang", "source")

  /** q227 per-stratum allocation; sf-independent constant. */
  val topkPerStratum = 200

  /** q286 — TOKEN-BUDGET GREEDY SELECTION: "fill a token budget with
    * the best documents" — the curation step that actually ends every
    * mix plan (q199 reweights, q259 maximizes coverage; this cuts the
    * ordered list where the budget runs out). Docs are ranked by an
    * exact-integer quality proxy (distinct-token ratio in ppm —
    * templated/repetitive spam scores low; q109's HHI is the
    * distribution-grain sibling) with doc_id tie-break (unique total
    * order → engine-independent selection), and a doc is selected iff
    * the tokens BEFORE it leave budget — the greedy prefix, boundary
    * doc included, the standard knapsack-relaxation rule. The budget is
    * half the corpus's total tokens, read from the prefix-sum kernel's
    * own total column (no extra job, no driver collect).
    *
    * Scale: token/quality scoring is one codegen'd projection; the
    * global ordered cumulative sum is the q218/q238 two-phase kernel
    * (range exchange + local windows; only the #partitions offsets
    * frame is sequential) — never a single-partition ORDER BY window.
    */
  def tokenBudgetSelection(spark: SparkSession, dir: String): DataFrame =
    budgetSelectionCore(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))

  private[graft] def budgetSelectionCore(docs: DataFrame): DataFrame = {
    val toks = graft.expr.TextFunctions.tokens(col("text"))
    val scored = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_dist"))
      .filter(col("n_tok") > 0)
      .withColumn("quality_ppm", expr("n_dist * 1000000 div n_tok"))
      .withColumn("neg_q", -col("quality_ppm"))
    GlobalIndex.prefixSummedBy(scored, Seq("neg_q", "doc_id"), Seq("n_tok"))
      .filter(col("cum_n_tok") - col("n_tok") < expr("total_n_tok div 2"))
      .select(col("doc_id"), col("quality_ppm"), col("n_tok"),
        col("cum_n_tok"))
      .orderBy(desc("quality_ppm"), asc("doc_id"))
  }

  /** q290 keep-rate in 16ths (4/16 = 25% of customers). */
  private[graft] val coherentSixteenths = 4

  /** q290 — REFERENTIALLY-COHERENT MULTI-TABLE SAMPLE: downsample an
    * ENTITY (customers) and take every table's rows for exactly the
    * sampled entities — the "dev slice of the warehouse" every team
    * cuts, where independent per-table sampling would orphan child
    * rows and break every join downstream. The decision is the q58
    * content-addressed nibble on the SHARED key, which is what makes
    * coherence join-free wherever the key is denormalized: customer
    * and orders each filter by hash(custkey) LOCALLY in their scan
    * stage — zero joins, guaranteed-consistent membership — and only
    * lineitem (whose schema hides custkey) pays one semi-join against
    * the sampled orders' keys. Emits a per-layer audit row
    * (rows kept + an exact mod-p key checksum) that pins MEMBERSHIP,
    * not just cardinality.
    *
    * Scale: two scan-local filters + one semi-join on l_orderkey (the
    * natural join key, salted/AQE-safe); checksums are map-side
    * combinable DECIMAL sums with one final mod — Σkey at 10¹² rows
    * passes 2⁶³, hence the decimal ride before the BIGINT emission.
    */
  def coherentSample(spark: SparkSession, dir: String): DataFrame = {
    val keep = (c: Column) => nibbleOf(c, ":coh") < coherentSixteenths
    val cust = Tables.customer(spark, dir).filter(keep(col("c_custkey")))
    val ord = Tables.orders(spark, dir).filter(keep(col("o_custkey")))
    val li = Tables.lineitem(spark, dir)
      .join(ord.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
    def audit(layer: String, df: DataFrame, key: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          expr(s"""coalesce(cast(sum(cast($key as decimal(38,0)))
                   % 1000000007 as bigint), 0)""").as("key_checksum"))
        .select(lit(layer).as("layer"), col("n_rows"), col("key_checksum"))
    audit("1_customer", cust, "c_custkey")
      .unionByName(audit("2_orders", ord, "o_orderkey"))
      .unionByName(audit("3_lineitem", li, "l_orderkey"))
      .orderBy("layer")
  }

  /** q227 prefilter oversample: expected survivors per stratum =
    * oversample·k, so the per-stratum sort below runs over ~800 rows
    * even when the stratum holds 50 TB. With k=200 the survivor count
    * is Binomial(n, 4k/n): P(< k) is astronomically small (Chernoff:
    * exp(−4k·(3/4)²/2) ≈ e⁻²²⁵), and the exactness-restoring fallback
    * below covers even that tail.
    */
  private val topkOversample = 4L

  /** q227 — EXACT-ALLOCATION STRATIFIED TOP-K: per language, the k
    * deterministically-"first" documents in md5 order — the balanced
    * eval-set builder (q58's rate sampler keeps a PROPORTION per
    * stratum; a leaderboard eval set wants an exact COUNT per stratum,
    * identical on every run and every engine). The naive formulation —
    * `row_number() OVER (PARTITION BY lang ORDER BY md5)` ≤ k — sorts
    * every stratum in full: one task per language, and the bulk
    * language IS the corpus (the q102 hot-key shape). The scalable
    * plan prefilters by hash prefix first:
    *
    *   1. count each stratum (hash agg, dimension-sized result);
    *   2. keep rows whose first-8-hex-digit value is below
    *      `thr_s ≈ 2³²·(oversample·k)/n_s` — a broadcast-joined
    *      per-row filter in the scan stage, expected survivors
    *      oversample·k per stratum;
    *   3. window-rank ONLY the survivors (bounded partitions).
    *
    * Exactness is unconditional, not probabilistic: the md5-hex
    * alphabet is ordered (0-9 < a-f), so `prefix8 < thr` is
    * downward-closed in the full-key order — the survivor set is a
    * PREFIX of each stratum's sort order, and ranking survivors equals
    * ranking the stratum whenever ≥ k survive. Strata where the
    * prefilter leaves < k rows (tiny strata keep everything anyway —
    * thr caps at 2³²; a hash-clustering fluke would land here too)
    * are detected by a dimension-sized count and re-ranked over their
    * FULL rows, so the output never depends on the filter's luck.
    * The oracle is the naive formulation — both must agree exactly.
    *
    * Scale: two projected scans of the stratum/key columns (count +
    * pool build) plus a broadcast filter; no full-stratum sort
    * anywhere. 100 TB cost is the scans, which prune to 2 columns.
    */
  def stratifiedTopK(spark: SparkSession, dir: String): DataFrame =
    stratifiedTopKCore(Tables.documents(spark, dir), topkPerStratum)

  private[graft] def stratifiedTopKCore(docs0: DataFrame, k: Int): DataFrame = {
    val docs = docs0.select(col("lang"), col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":topk"))
          .cast("binary")).as("key"))
      .withColumn("h", conv(substring(col("key"), 1, 8), 16, 10)
        .cast("long"))
    val ns = docs.groupBy("lang").agg(count(lit(1)).as("n_s"))
    val thr = ns.select(col("lang"),
      least(lit(4294967296L), expr(
        s"cast(4294967296 as bigint) * ${topkOversample * k} div n_s + 1"))
        .as("thr"))
    val surv = docs.join(broadcast(thr), Seq("lang"))
      .filter(col("h") < col("thr"))
    // strata the prefilter left short of k (dimension-sized frame;
    // right join so a stratum with ZERO survivors still appears)
    val short = surv.groupBy("lang").agg(count(lit(1)).as("c"))
      .join(ns, Seq("lang"), "right")
      .filter(coalesce(col("c"), lit(0L)) < k)
      .select("lang")
    val pool = surv.select("lang", "key", "doc_id")
      .join(broadcast(short), Seq("lang"), "left_anti")
      .unionByName(docs.select("lang", "key", "doc_id")
        .join(broadcast(short), Seq("lang"), "left_semi"))
    val wk = Window.partitionBy("lang").orderBy("key", "doc_id")
    pool.withColumn("rn", row_number().over(wk).cast("long"))
      .filter(col("rn") <= k)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  val queries: Map[String, Q] = Map(
    "q227_stratified_topk" -> (stratifiedTopK(_, _)),
    "q199_mixture_reweight" -> (mixtureReweight(_, _)),
    "q193_poisson_bootstrap" -> (poissonBootstrap(_, _)),
    "q58_stratified_sample" -> (stratifiedSample(_, _)),
    "q59_train_eval_split" -> (trainEvalSplit(_, _)),
    "q299_leakage_safe_split" -> (leakageSafeSplit(_, _)),
    "q144_group_kfold" -> (groupKFold(_, _)),
    "q181_negative_samples" -> (negativeSamples(_, _)),
    "q184_weighted_sample" -> (weightedPrioritySample(_, _)),
    "q326_priority_estimates" -> (priorityEstimates(_, _)),
    "q252_rendezvous_sharding" -> (rendezvousSharding(_, _)),
    "q255_token_apportionment" -> (tokenApportionment(_, _)),
    "q309_temperature_mixture" -> (temperatureMixture(_, _)),
    "q286_token_budget_selection" -> (tokenBudgetSelection(_, _)),
    "q290_coherent_sample" -> (coherentSample(_, _)))

  val oracles: Map[String, String] = Map(
    // q290: same md5-nibble membership (q58's hex-strpos form), the
    // lineitem layer via IN over the sampled orders, same mod-p
    // checksum in HUGEINT
    "q290_coherent_sample" ->
      s"""WITH sc AS (
            SELECT c_custkey FROM customer
            WHERE strpos('0123456789abcdef',
              substr(md5(c_custkey::VARCHAR || ':coh'), 1, 1)) - 1
              < $coherentSixteenths),
          so AS (
            SELECT o_orderkey FROM orders
            WHERE strpos('0123456789abcdef',
              substr(md5(o_custkey::VARCHAR || ':coh'), 1, 1)) - 1
              < $coherentSixteenths),
          sl AS (
            SELECT l_orderkey FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM so))
          SELECT '1_customer' AS layer, count(*)::BIGINT AS n_rows,
            coalesce((sum(c_custkey::HUGEINT) % 1000000007)::BIGINT, 0)
              AS key_checksum FROM sc
          UNION ALL
          SELECT '2_orders', count(*)::BIGINT,
            coalesce((sum(o_orderkey::HUGEINT) % 1000000007)::BIGINT, 0)
          FROM so
          UNION ALL
          SELECT '3_lineitem', count(*)::BIGINT,
            coalesce((sum(l_orderkey::HUGEINT) % 1000000007)::BIGINT, 0)
          FROM sl
          ORDER BY layer""",
    // q286: same tokenizer mapping, same integer quality proxy, same
    // greedy-prefix boundary rule via a plain ordered window (the
    // oracle's single-node sort is its privilege; the engine must
    // reproduce it from the two-phase kernel)
    "q286_token_budget_selection" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
           FROM documents WHERE text IS NOT NULL),
         s AS (
           SELECT doc_id, len(ws)::BIGINT AS n_tok,
             len(list_distinct(ws))::BIGINT AS n_dist
           FROM t WHERE len(ws) > 0),
         q AS (
           SELECT doc_id, n_tok,
             (n_dist * 1000000 // n_tok)::BIGINT AS quality_ppm
           FROM s),
         c AS (
           SELECT *,
             sum(n_tok) OVER (ORDER BY quality_ppm DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::BIGINT AS cum_n_tok,
             sum(n_tok) OVER ()::BIGINT AS total
           FROM q)
         SELECT doc_id, quality_ppm, n_tok, cum_n_tok
         FROM c WHERE cum_n_tok - n_tok < total // 2
         ORDER BY quality_ppm DESC, doc_id""",
    // q309: q255's apportionment replay over the α=0.5 temperature
    // weights — same exact integer chain, the one identical double
    // sqrt+floor on an exact ≤1e12 integer
    "q309_temperature_mixture" ->
      s"""WITH wts AS (
            SELECT lang,
              sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
                ::BIGINT AS n_tokens
            FROM documents WHERE text IS NOT NULL GROUP BY 1),
          tot AS (SELECT sum(n_tokens)::BIGINT AS tot FROM wts),
          sh AS (
            SELECT lang, n_tokens,
              ((n_tokens::HUGEINT * 1000000) // tot)::BIGINT AS share_ppm,
              floor(sqrt((((n_tokens::HUGEINT * 1000000) // tot))::DOUBLE
                * 1000000.0))::BIGINT AS w
            FROM wts CROSS JOIN tot),
          tw AS (SELECT sum(w)::BIGINT AS tw FROM sh),
          base AS (
            SELECT lang, n_tokens, share_ppm, w,
              ($tempBudget * w) // tw AS floor_alloc,
              ($tempBudget * w) % tw AS rem,
              $tempBudget - sum(($tempBudget * w) // tw) OVER ()
                AS leftover,
              row_number() OVER (ORDER BY ($tempBudget * w) % tw DESC,
                lang) AS rk
            FROM sh CROSS JOIN tw)
          SELECT lang, n_tokens, share_ppm, w AS w_ppm,
            floor_alloc::BIGINT AS floor_alloc, rem::BIGINT AS rem,
            (floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
              ::BIGINT AS alloc
          FROM base ORDER BY lang""",
    // q255: same whitespace token count (the q66 tokenizer mapping),
    // same integer quota/remainder rule, same tie order
    "q255_token_apportionment" ->
      s"""WITH wts AS (
            SELECT lang,
              sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
                ::BIGINT AS w
            FROM documents WHERE text IS NOT NULL GROUP BY 1),
          tot AS (SELECT sum(w)::BIGINT AS tw FROM wts),
          base AS (
            SELECT lang, w,
              ($apportionBudget * w) // tw AS floor_alloc,
              ($apportionBudget * w) % tw AS rem,
              $apportionBudget - sum(($apportionBudget * w) // tw) OVER ()
                AS leftover,
              row_number() OVER (ORDER BY ($apportionBudget * w) % tw DESC,
                lang) AS rk
            FROM wts CROSS JOIN tot)
          SELECT lang, w AS n_tokens, floor_alloc::BIGINT AS floor_alloc,
            rem::BIGINT AS rem,
            (floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
              ::BIGINT AS alloc
          FROM base ORDER BY lang""",
    // q252: per-shard arg-max replayed with the same md5 weights;
    // DuckDB picks the argmax with a (w, s)-ordered window
    "q252_rendezvous_sharding" -> {
      def w(s: Int) =
        s"('0x' || substr(md5(doc_id::VARCHAR || ':hrw:" + s.toString +
          "'), 1, 12))::BIGINT"
      def pick(n: Int, alias: String) =
        (0 until n).map(s => s"(${w(s)}, ${s}::BIGINT)").mkString(
          s"list_max([", ", ", s"])[2] AS $alias")
      s"""WITH a AS (
            SELECT doc_id, ${pick(hrwShards, "shard_before")},
              ${pick(hrwShardsAfter, "shard_after")}
            FROM documents)
          SELECT shard_after, count(*)::BIGINT AS n_docs,
            sum(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0
                END)::BIGINT AS n_moved
          FROM a GROUP BY 1 ORDER BY 1""" },
    // q227: the NAIVE full-sort formulation — the prefilter plan must
    // reproduce it exactly (same md5 key, same doc_id tie-break)
    "q227_stratified_topk" ->
      s"""SELECT lang, rn, doc_id FROM (
            SELECT lang, doc_id,
              row_number() OVER (PARTITION BY lang
                ORDER BY md5(doc_id::VARCHAR || ':topk'), doc_id) AS rn
            FROM documents) t
          WHERE rn <= $topkPerStratum
          ORDER BY lang, rn""",
    // q199: same cell collapse, same integral target/cap arithmetic
    "q199_mixture_reweight" ->
      """WITH c AS (
           SELECT lang, source, count(*)::BIGINT AS n_rows
           FROM documents GROUP BY 1, 2),
         e AS (
           SELECT *,
             sum(n_rows) OVER (PARTITION BY lang) AS lang_rows,
             sum(n_rows) OVER () AS total_rows,
             (SELECT count(DISTINCT lang) FROM c) AS n_langs
           FROM c),
         k AS (
           SELECT *, least(1000000::HUGEINT,
             (total_rows // n_langs)::HUGEINT * 1000000 // lang_rows)
             AS keep
           FROM e)
         SELECT lang, source, n_rows,
           keep::BIGINT AS keep_ppm,
           (n_rows::HUGEINT * keep // 1000000)::BIGINT AS expected_rows
         FROM k ORDER BY 1, 2""",
    // the identical md5-nibble rule re-evaluated by DuckDB (nibble value
    // via hex-alphabet strpos — no hex-literal cast dialect dependence)
    "q58_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             strpos('0123456789abcdef',
               substr(md5(doc_id::VARCHAR || ':strat'), 1, 1)) - 1 AS h
           FROM documents)
         WHERE h < (CASE lang WHEN 'zh' THEN 8 WHEN 'en' THEN 4 ELSE 2 END)
         ORDER BY doc_id""",
    "q59_train_eval_split" ->
      """SELECT doc_id, lang,
           CASE WHEN strpos('0123456789abcdef',
             substr(md5(doc_id::VARCHAR || ':split'), 1, 1)) - 1 < 14
           THEN 'train' ELSE 'eval' END AS split
         FROM documents ORDER BY doc_id""",
    // q299: same md5(text) content identity as q50, same nibble rule
    // as q59 keyed on the group rep; the straddle audit recomputed
    // from the row-level rule
    "q299_leakage_safe_split" ->
      """WITH d AS (
            SELECT doc_id, md5(text) AS th,
              (strpos('0123456789abcdef',
                substr(md5(doc_id::VARCHAR || ':split'), 1, 1)) - 1 < 14)
                AS naive_train
            FROM documents WHERE text IS NOT NULL),
          g AS (
            SELECT th, min(doc_id)::BIGINT AS rep_id,
              count(*)::BIGINT AS group_n,
              count(DISTINCT naive_train)::BIGINT AS naive_sides
            FROM d GROUP BY 1)
          SELECT doc_id, rep_id, group_n,
            CASE WHEN strpos('0123456789abcdef',
              substr(md5(rep_id::VARCHAR || ':split'), 1, 1)) - 1 < 14
            THEN 'train' ELSE 'eval' END AS split,
            naive_sides > 1 AS naive_straddled
          FROM d JOIN g USING (th) ORDER BY doc_id""",
    // q144: the same nibble rule keyed on user_id; fold = nibble // 4
    "q144_group_kfold" ->
      s"""SELECT ((strpos('0123456789abcdef',
              substr(md5(user_id::VARCHAR || ':fold'), 1, 1)) - 1)
              // ${16 / kFolds})::BIGINT AS fold,
            event_type, count(*) AS n_events,
            count(DISTINCT user_id)::BIGINT AS n_users
          FROM events WHERE ts IS NOT NULL
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // q193: every replicate's nibble→weight table, DECIMAL-widened
    // weighted sums, and truncating mean re-derived per (key, b)
    "q193_poisson_bootstrap" ->
      s"""WITH w AS (
            SELECT b.b AS replicate,
              CASE WHEN h < 6 THEN 0 WHEN h < 12 THEN 1
                   WHEN h < 15 THEN 2 ELSE 3 END AS w,
              cents
            FROM (
              SELECT o_orderkey,
                CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)) AS BIGINT)
                  AS cents
              FROM orders) o
            CROSS JOIN range(${bootstrapReplicates}) b(b)
            CROSS JOIN LATERAL (SELECT strpos('0123456789abcdef',
              substr(md5(o.o_orderkey::VARCHAR || ':' || b.b::VARCHAR
                || ':boot'), 1, 1)) - 1 AS h) x)
          SELECT replicate, sum(w)::BIGINT AS n_eff,
            (sum(w::HUGEINT * cents) // nullif(sum(w), 0))::BIGINT
              AS mean_cents
          FROM w GROUP BY 1 ORDER BY 1""",
    // q184: the identical md5-u32, weight, and integer-division
    // priority re-derived in DuckDB ('0x'-prefixed hex cast = Spark's
    // conv(…,16,10)); same top-k, same (priority, key) tie-break
    "q184_weighted_sample" ->
      s"""SELECT o_orderkey, w, (w * 4294967296) // u AS priority FROM (
            SELECT o_orderkey,
              CAST(floor(o_totalprice) AS BIGINT) + 1 AS w,
              ('0x' || substr(md5(o_orderkey::VARCHAR || ':wsamp'), 1, 8))
                ::BIGINT + 1 AS u
            FROM orders)
          ORDER BY priority DESC, o_orderkey LIMIT $prioritySampleK""",
    // q326: q184's integer chain, τ from the (k+1)-th row, exact
    // greatest(w, τ) estimates
    "q326_priority_estimates" ->
      s"""WITH q AS (
            SELECT o_orderkey, w, (w * 4294967296) // u AS priority FROM (
              SELECT o_orderkey,
                CAST(floor(o_totalprice) AS BIGINT) + 1 AS w,
                ('0x' || substr(md5(o_orderkey::VARCHAR || ':wsamp'), 1, 8))
                  ::BIGINT + 1 AS u
              FROM orders)),
          r AS (
            SELECT o_orderkey, w, priority,
              row_number() OVER (ORDER BY priority DESC, o_orderkey)
                AS rank
            FROM q),
          t AS (
            SELECT coalesce(max(CASE WHEN rank = ${prioritySampleK + 1}
              THEN priority END), 0) AS tau
            FROM r WHERE rank <= ${prioritySampleK + 1})
          SELECT rank, o_orderkey, w, priority::BIGINT AS priority,
            greatest(w, tau)::BIGINT AS w_est
          FROM r, t WHERE rank <= $prioritySampleK ORDER BY rank""",
    // q181: the identical five-nibble hash, modulus, anti-join and
    // tie-break replayed in DuckDB — the sample must match bit-for-bit
    "q181_negative_samples" ->
      s"""WITH pos AS (
           SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         p AS (SELECT max(p_partkey) + 1 AS n_items FROM part),
         users AS (SELECT DISTINCT user_id FROM pos),
         cand AS (
           SELECT user_id, i,
             (65536 * (strpos('0123456789abcdef', substr(h,1,1)) - 1)
              + 4096 * (strpos('0123456789abcdef', substr(h,2,1)) - 1)
              + 256 * (strpos('0123456789abcdef', substr(h,3,1)) - 1)
              + 16 * (strpos('0123456789abcdef', substr(h,4,1)) - 1)
              + (strpos('0123456789abcdef', substr(h,5,1)) - 1))
               % (SELECT n_items FROM p) AS item_id
           FROM (
             SELECT user_id, t.i AS i,
               md5(user_id::VARCHAR || ':' || t.i::VARCHAR || ':neg') AS h
             FROM users CROSS JOIN range($negOversample) t(i))),
         neg AS (
           SELECT c.user_id, c.item_id, min(c.i) AS i
           FROM cand c
           WHERE NOT EXISTS (SELECT 1 FROM pos
                             WHERE pos.user_id = c.user_id
                               AND pos.item_id = c.item_id)
           GROUP BY 1, 2),
         rk AS (
           SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY i, item_id) AS rk
           FROM neg)
         SELECT user_id, item_id, i FROM rk WHERE rk <= $negPerUser
         ORDER BY user_id, i, item_id""")
}
