package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pipeline data-quality gates beyond the per-column profile (q127):
  * cross-table referential integrity and the partial-aggregate merge
  * identity that incremental (base + delta) pipelines rely on.
  *
  * Not in the reference (its pipelines trust their join keys blindly —
  * e.g. relation_graph joins name pairs with no orphan accounting);
  * first-class capability for a 100 TB warehouse, where a broken
  * upstream export shows up first as dangling foreign keys and a
  * re-run-the-world batch is exactly what the merge identity exists to
  * avoid.
  */
object Quality {

  /** One audited relation: the child PRE-COLLAPSED to key grain, parent
    * rows owning `pkey` (assumed unique — it is the parent's primary
    * key). Callers that audit one child table against several parent
    * sets pass the SAME collapsed frame to each relation, so the child
    * scan+collapse subplan is identical across union branches and
    * Spark's exchange reuse executes it once.
    */
  private final case class Fk(relation: String, childKeys: DataFrame,
                              parent: DataFrame, pkey: String)

  /** Collapse a child table to (key, row-count) — the audit joins run
    * at |distinct keys|, not |child rows|: the q77-style collapse that
    * keeps a 10-billion-row fact table's audit join at dimension scale.
    */
  private def childKeysOf(child: DataFrame, key: String): DataFrame =
    child.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))

  /** Audit one FK relation in BOTH directions at KEY grain: a
    * full-outer join of the collapsed child against the parent key set
    * yields orphan children (no parent) and childless parents (no
    * child) in one pass.
    */
  private def auditOne(fk: Fk): DataFrame = {
    val parentKeys = fk.parent.select(col(fk.pkey).as("k"), lit(1).as("hit"))
    fk.childKeys.join(parentKeys, Seq("k"), "full_outer")
      .agg(
        coalesce(sum("cnt"), lit(0L)).as("n_child"),
        coalesce(sum(when(col("hit").isNull, col("cnt"))), lit(0L))
          .as("n_orphan"),
        count(when(col("hit").isNull, col("k"))).as("n_orphan_keys"),
        count(col("hit")).as("n_parent"),
        count(when(col("cnt").isNull, col("k"))).as("n_childless"))
      .select(lit(fk.relation).as("relation"), col("n_child"),
        col("n_orphan"), col("n_orphan_keys"), col("n_parent"),
        col("n_childless"))
  }

  /** q129 — REFERENTIAL-INTEGRITY AUDIT over the star schema: for each
    * FK relation, orphan children (facts whose dimension row is
    * missing) and childless parents (dimension rows no fact ever
    * references). The fourth relation audits a SLICE EXTRACT — events
    * against only the AUTOMOBILE-segment customers — the "we shipped a
    * filtered dim copy, what dangles?" shape, which guarantees the
    * orphan path is exercised with real non-zero counts (the synthetic
    * star itself is referentially clean, and the audit's job is to
    * prove that, not assume it).
    */
  def fkIntegrity(s: SparkSession, d: String): DataFrame = {
    val customer = Tables.customer(s, d)
    // ONE collapse of the fact table feeds both its audits (full dim +
    // slice extract) — exchange reuse makes the second branch free
    val eventKeys = childKeysOf(Tables.events(s, d), "user_id")
    val relations = Seq(
      Fk("events.user_id->customer", eventKeys, customer, "c_custkey"),
      Fk("events.user_id->customer[AUTOMOBILE]", eventKeys,
        customer.filter(col("c_mktsegment") === "AUTOMOBILE"), "c_custkey"),
      Fk("lineitem.l_orderkey->orders",
        childKeysOf(Tables.lineitem(s, d), "l_orderkey"),
        Tables.orders(s, d), "o_orderkey"),
      Fk("orders.o_custkey->customer",
        childKeysOf(Tables.orders(s, d), "o_custkey"), customer, "c_custkey"))
    relations.map(auditOne).reduce(_ unionByName _).orderBy("relation")
  }

  /** One joinability probe: both columns distinct-collapsed (hash agg —
    * the ONLY corpus-scale stage), then a full-outer equi-join of the
    * two key SETS feeds one tiny aggregate. Scale: |distinct| per side,
    * never |rows|; ppm products stay in BIGINT to ~9·10¹² distinct keys
    * per column (far past any real key domain).
    */
  private[graft] def joinabilityOne(pair: String, a: DataFrame, ac: String,
                                    b: DataFrame, bc: String): DataFrame = {
    def keys(df: DataFrame, c: String, tag: String) =
      df.filter(col(c).isNotNull)
        .select(col(c).cast("bigint").as("k")).distinct()
        .withColumn(tag, lit(1))
    keys(a, ac, "in_a").join(keys(b, bc, "in_b"), Seq("k"), "full_outer")
      .agg(count("in_a").as("n_a"), count("in_b").as("n_b"),
        count(when(col("in_a").isNotNull && col("in_b").isNotNull, 1))
          .as("n_both"))
      .select(lit(pair).as("pair"), col("n_a"), col("n_b"), col("n_both"),
        expr("n_both * 1000000 div nullif(n_a, 0)").as("a_in_b_ppm"),
        expr("n_both * 1000000 div nullif(n_b, 0)").as("b_in_a_ppm"),
        expr("n_both * 1000000 div nullif(n_a + n_b - n_both, 0)")
          .as("jaccard_ppm"))
  }

  /** q240 — JOINABILITY DISCOVERY over candidate column pairs: exact
    * key-set containment in BOTH directions plus Jaccard, per pair.
    * This is the data-discovery profiler (the Aurum/"which columns
    * join" question) — the complement of q129, which audits DECLARED
    * FK relations for violations; this one ranks CANDIDATE pairs, with
    * two deliberately false pairs (partkey~suppkey, suppkey~custkey)
    * in the set so the output demonstrably discriminates true
    * relations (containment ≈ 10⁶) from coincidental overlap (dense
    * integer key ranges overlap by accident — the reason direction
    * matters and Jaccard alone misleads).
    *
    * At 100 TB each probe is one distinct-collapse per column (map-side
    * partial agg absorbs the fact-table grain) + one key-set join; the
    * sketch twin for EXPLORATORY sweeps over thousands of pairs is
    * q160's HLL register algebra (inclusion–exclusion on merged
    * sketches) — this query is the exact tier run on the shortlist.
    */
  def joinabilityProfile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    Seq(
      joinabilityOne("events.user_id~customer.c_custkey",
        Tables.events(s, d), "user_id", Tables.customer(s, d), "c_custkey"),
      joinabilityOne("lineitem.l_partkey~supplier.s_suppkey",
        li, "l_partkey", Tables.supplier(s, d), "s_suppkey"),
      joinabilityOne("lineitem.l_suppkey~supplier.s_suppkey",
        li, "l_suppkey", Tables.supplier(s, d), "s_suppkey"),
      joinabilityOne("nation.n_nationkey~region.r_regionkey",
        Tables.nation(s, d), "n_nationkey", Tables.region(s, d), "r_regionkey"),
      joinabilityOne("orders.o_custkey~customer.c_custkey",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"),
      joinabilityOne("supplier.s_suppkey~customer.c_custkey",
        Tables.supplier(s, d), "s_suppkey", Tables.customer(s, d), "c_custkey")
    ).reduce(_ unionByName _).orderBy("pair")
  }

  /** The deterministic base/delta assignment for q130 — md5-nibble on
    * event_id (the q58/q59 discipline: content-keyed, seed-stable,
    * layout-independent), 12/16 base : 4/16 delta.
    */
  private[graft] def incrSplit: Column =
    when(conv(substring(md5(concat(col("event_id").cast("string"),
      lit(":incr")).cast("binary")), 1, 1), 16, 10).cast("int") < 12,
      "base").otherwise("delta")

  /** q130 — INCREMENTAL ROLLUP MERGE IDENTITY: split events into a
    * deterministic base (12/16) and delta (4/16), compute the rollup
    * PARTIALLY per split, then merge the partials with the
    * merge-formula algebra (sum of counts, sum of exact decimal sums,
    * min of mins, max of maxes) — and gate the merged result against
    * the oracle's DIRECT aggregate over everything. This is the
    * contract an incremental pipeline stands on at 100 TB: yesterday's
    * materialized partial plus today's delta partial must equal the
    * full recompute bit-for-bit, which holds only if every carried
    * metric is mergeable and exact (decimal sums, not floats — float
    * addition is not associative, and a base+delta regroup WOULD drift).
    * The registered plan executes the real two-phase shape: partial
    * Aggregate per (part, event_type), then the merge Aggregate.
    */
  def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    val partials = Tables.eventsMicros(s, d)
      .withColumn("part", incrSplit)
      .groupBy("part", "event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).as("vsum"),
        min("tsu").as("tmin"),
        max("tsu").as("tmax"))
    partials
      .groupBy("event_type")
      .agg(
        sum("cnt").as("n_events"),
        round(sum("vsum").cast("double"), 2).as("value_sum"),
        min("tmin").as("tsu_min"),
        max("tmax").as("tsu_max"))
      .orderBy("event_type")
  }

  /** The q133 tombstone rule — md5-nibble on user_id (salt ":purge"),
    * nibble 0 → 1/16 of users are deletion-requested.
    */
  private[graft] def purgeNibble: Column =
    conv(substring(md5(concat(col("user_id").cast("string"),
      lit(":purge")).cast("binary")), 1, 1), 16, 10).cast("int")

  /** q133 — COMPLIANCE PURGE (right-to-be-forgotten): delete every
    * event belonging to a TOMBSTONE LIST of users and account for what
    * was removed. The deletion set is carried as a real list-frame and
    * applied with a LEFT ANTI join — not folded into a scan predicate —
    * because at 100 TB the list arrives from outside (a requests
    * table), is not expressible as a predicate over the fact columns,
    * and is dimension-sized → the anti-join broadcasts and the fact
    * table streams through in one pass, never shuffling. Output is the
    * post-purge rollup PLUS the removal accounting (purged rows/users
    * per type live alongside surviving rows in one frame), so the gate
    * checks both presence and absence. The derivation of the tombstone
    * list here (md5-nibble of user_id, q58's content-keyed discipline)
    * is verification plumbing: production swaps in `spark.read` of the
    * requests table, same plan below it. QualitySpec additionally
    * proves ABSENCE on the purged copy — zero surviving rows for any
    * tombstoned user — and exact row conservation.
    */
  def compliancePurge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val tombstones = ev.select(col("user_id")).distinct()
      .filter(purgeNibble === 0)
    val tagged = ev.join(broadcast(tombstones.withColumn("purged", lit(1))),
      Seq("user_id"), "left")
    tagged
      .groupBy("event_type")
      .agg(
        count(when(col("purged").isNull, 1)).as("n_kept"),
        count(col("purged")).as("n_purged"),
        countDistinct(when(col("purged") === 1, col("user_id")))
          .as("n_purged_users"),
        round(coalesce(sum(when(col("purged").isNull,
          col("value").cast("decimal(18,6)"))), lit(0).cast("decimal(18,6)"))
          .cast("double"), 2).as("kept_value_sum"))
      .orderBy("event_type")
  }

  /** The purged survivor frame itself (what production would write back
    * out) — the spec drives this to prove absence and conservation.
    */
  private[graft] def purgedEvents(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val tombstones = ev.select(col("user_id")).distinct()
      .filter(purgeNibble === 0)
    ev.join(broadcast(tombstones), Seq("user_id"), "left_anti")
  }

  /** Benford expected first-digit shares, parts-per-million:
    * round(log10(1 + 1/d)·10⁶). Carried as INTEGER CONSTANTS — the
    * engine and the oracle share the same nine literals instead of each
    * calling a transcendental log, so the comparison is exact by
    * construction (they sum to exactly 1 000 000).
    */
  private[graft] val benfordPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** q153 — BENFORD FIRST-DIGIT AUDIT over order totals: the classic
    * fraud/corruption screen on any money column (naturally-grown
    * multiplicative amounts follow log-uniform leading digits; invented
    * or truncated data doesn't). Pure integer pipeline: first digit via
    * floor → BIGINT → first character (never double→int casts — Spark
    * truncates, DuckDB rounds: exactly the cross-engine trap), observed
    * share in ppm by integer division, deviation = |obs − benford| in
    * ppm. One hash aggregate to 9 cells; at 100 TB the audit is a single
    * map-side-combined pass whatever the table size.
    */
  def benfordDigits(s: SparkSession, d: String): DataFrame = {
    val digitCol = substring(floor(col("o_totalprice")).cast("long")
      .cast("string"), 1, 1).cast("int")
    val expected = benfordPpm.foldLeft(lit(null).cast("long")) {
      case (acc, (dg, ppm)) => when(col("digit") === dg, ppm).otherwise(acc)
    }
    val counts = Tables.orders(s, d)
      .filter(col("o_totalprice") >= 1)
      .select(digitCol.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // 9-row frame: the whole-frame window total is driver-trivial
    val total = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    counts
      .withColumn("n_total", sum("n").over(total))
      // integer div, NOT `/`: Column./ on BIGINTs is double division
      .withColumn("obs_ppm", expr("(n * 1000000) div n_total"))
      .drop("n_total")
      .withColumn("benford_ppm", expected)
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .select("digit", "n", "obs_ppm", "benford_ppm", "dev_ppm")
      .orderBy("digit")
  }

  /** One audited dependency for q157: does `lhs → rhs` hold in `df`?
    * Group to LHS grain counting distinct RHS values, then collapse to
    * one accounting row. Two hash aggregates, both keyed on the LHS —
    * at 100 TB the first is map-side-combined to |distinct LHS| and the
    * second is a scalar fold; nothing is ever pairwise.
    */
  private[graft] def fdAuditOne(df: DataFrame, relation: String,
                                lhs: Seq[String], rhs: String): DataFrame =
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("n_rhs"), count(lit(1)).as("n_rows"))
      .agg(
        count(lit(1)).as("n_lhs_groups"),
        count(when(col("n_rhs") > 1, 1)).as("n_violating"),
        max("n_rhs").as("max_rhs"),
        sum(when(col("n_rhs") > 1, col("n_rows"))).as("n_rows_in_violation"))
      .select(lit(relation).as("dependency"), col("n_lhs_groups"),
        col("n_violating"), col("max_rhs"),
        coalesce(col("n_rows_in_violation"), lit(0L))
          .as("n_rows_in_violation"))

  /** q157 — FUNCTIONAL-DEPENDENCY / CANDIDATE-KEY AUDIT: for each
    * declared-or-suspected dependency `LHS → RHS`, how many LHS groups
    * carry more than one RHS value (violations), how bad the worst
    * group is, and how many rows sit inside violating groups. This is
    * the schema-discovery half of data profiling (q127 profiles
    * columns in isolation; this audits the relationships BETWEEN them)
    * — on a 100 TB lake it is how you learn whether "event_id is
    * unique" or "an order never changes priority" actually holds
    * before a pipeline silently relies on it. The audited set mixes
    * dependencies that genuinely hold (candidate keys — proved held,
    * not assumed) with ones that genuinely fail, so both code paths
    * are exercised with non-zero counts.
    */
  def fdAudit(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val li = Tables.lineitem(s, d)
    val audits = Seq(
      fdAuditOne(ev, "events: event_id -> user_id", Seq("event_id"),
        "user_id"),
      fdAuditOne(ev, "events: user_id -> event_type", Seq("user_id"),
        "event_type"),
      fdAuditOne(li, "lineitem: (l_orderkey, l_linenumber) -> l_partkey",
        Seq("l_orderkey", "l_linenumber"), "l_partkey"),
      fdAuditOne(li, "lineitem: l_orderkey -> l_suppkey",
        Seq("l_orderkey"), "l_suppkey"),
      fdAuditOne(Tables.orders(s, d), "orders: o_custkey -> o_orderpriority",
        Seq("o_custkey"), "o_orderpriority"),
      fdAuditOne(Tables.nation(s, d), "nation: n_nationkey -> n_regionkey",
        Seq("n_nationkey"), "n_regionkey"))
    audits.reduce(_ unionByName _).orderBy("dependency")
  }

  /** q253 — CHI-SQUARE INDEPENDENCE STATISTIC over the (market
    * segment × order priority) contingency table: the single rollup
    * number an alerting system thresholds, complementing q158's
    * per-cell lift map (lift says WHERE the table deviates; χ² says
    * HOW MUCH in total, with its degrees of freedom). Exact
    * fixed-point arithmetic end to end: per cell
    * χ²_cell·10⁶ = (O·N − r·c)²·10⁶ div (N·r·c) over DECIMAL(38,0)
    * (DuckDB HUGEINT), summed as exact integers — no transcendental,
    * no fp association order, engine-identical to the last digit.
    * Exact to N ≈ 3·10⁹ rows ((N²)² ≤ 10³⁸); past that ANSI RAISES,
    * never silently saturates (the q237/q239 stance).
    *
    * ZERO CELLS count: a (segment, priority) combination with no
    * orders still contributes r·c/N to χ², so the cell frame is the
    * full margin cross product (a broadcast of two dimension-sized
    * frames), left-joined with observed counts — omitting empty cells
    * understates the statistic exactly when dependence is strongest.
    *
    * Scale: one fact scan → hash agg to |segments|×|priorities| cells;
    * margins/total re-aggregate the CELLS (never the fact table); the
    * grid cross join is dimension×dimension (5×5).
    */
  def chiSquareIndependence(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
    chiSquareCore(fact)
  }

  /** Core over any (seg, prio) frame — fixture seam for the spec. */
  private[graft] def chiSquareCore(fact: DataFrame): DataFrame = {
    val cells = fact.groupBy("seg", "prio").agg(count(lit(1)).as("n_obs"))
    val rm = cells.groupBy("seg").agg(sum("n_obs").as("rt"))
    val cm = cells.groupBy("prio").agg(sum("n_obs").as("ct"))
    val tot = cells.agg(sum("n_obs").as("n"))
    val grid = broadcast(rm).crossJoin(broadcast(cm)).crossJoin(broadcast(tot))
      .join(cells, Seq("seg", "prio"), "left")
      .withColumn("o", coalesce(col("n_obs"), lit(0L)))
    grid
      .withColumn("cell_e6", Exact.orOverflowError(expr(
        """(cast(o as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)
           * (cast(o as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)
           * 1000000
           div (cast(n as decimal(38,0)) * rt * ct)"""), "chi2"))
      .agg(
        count(lit(1)).as("n_cells"),
        countDistinct("seg").as("n_segs"),
        countDistinct("prio").as("n_prios"),
        max("n").as("n_rows"),
        sum("cell_e6").cast("long").as("chi2_e6"))
      .withColumn("dof", (col("n_segs") - 1) * (col("n_prios") - 1))
      .select("n_cells", "n_rows", "dof", "chi2_e6")
  }

  /** q158 — CROSS-FIELD INDEPENDENCE LIFT: for every (event_type,
    * day-of-week) cell, observed count against the count independence
    * predicts from the margins, as lift_ppm = ⌊o·N·10⁶ / (n_type·n_dow)⌋
    * — 10⁶ means independent, above/below means the type concentrates
    * in / avoids that weekday. This is the contingency-table audit
    * behind seasonality checks and drift alarms, as PURE INTEGER
    * arithmetic: lift is the ratio form of the chi-square cell (its
    * log is PMI, q111's measure) but needs no square and no
    * transcendental, so the cross-engine contract is exact integer
    * division of exact counts (decimal(38,0) on the Spark side, HUGEINT
    * in DuckDB — products reach o·N·10⁶ ≈ 10¹⁶ at sf0.1 and ~10³⁰ at
    * petabyte counts, past Long either way). One scan feeds cells and
    * both margins; margins and total are dimension-sized joins AQE
    * broadcasts.
    */
  def independenceLift(s: SparkSession, d: String): DataFrame =
    independenceLiftCore(Tables.eventsMicros(s, d)
      .select(col("event_type"),
        expr("((tsu div 86400000000) + 3) % 7").as("dow")))

  /** Core over any frame with (event_type, dow) — fixture-injection
    * seam for the spec. ONE scan: margins and the total re-aggregate
    * the |types|×7 cells frame (exact long sums), never the events.
    */
  private[graft] def independenceLiftCore(ev: DataFrame): DataFrame = {
    val cells = ev.groupBy("event_type", "dow").agg(count(lit(1)).as("n_obs"))
    val byType = cells.groupBy("event_type").agg(sum("n_obs").as("n_type"))
    val byDow = cells.groupBy("dow").agg(sum("n_obs").as("n_dow"))
    val total = cells.agg(sum("n_obs").as("n_total"))
    cells
      .join(byType, "event_type")
      .join(byDow, "dow")
      .crossJoin(broadcast(total)) // single-row frame (sanctioned)
      .withColumn("lift_ppm", expr(
        """(cast(n_obs AS DECIMAL(38,0)) * n_total * 1000000)
           div (cast(n_type AS DECIMAL(38,0)) * n_dow)"""))
      .select("event_type", "dow", "n_obs", "n_type", "n_dow", "n_total",
        "lift_ppm")
      .orderBy("event_type", "dow")
  }

  type Q = (SparkSession, String) => DataFrame

  /** Minimum group size below which the quasi-identifier is suppressed
    * in the masked export (the k of k-anonymity).
    */
  private[graft] val kAnonymity = 5

  /** q187 — GOVERNED EXPORT (pseudonymization + k-anonymity): the
    * shape every data-sharing/clean-room export runs. Direct
    * identifiers are tokenized (first 16 hex of salted SHA-256 — a
    * deterministic join-stable token, NOT reversible masking, so two
    * exports of the same customer still link); the numeric
    * quasi-identifier is generalized to $1000 bands; and any
    * (segment, band) cell smaller than k is SUPPRESSED (band → null),
    * the standard k-anonymity rule — a cell of 2 customers would
    * re-identify by intersection even through the tokens. `n_in_cell`
    * stays in the output so the suppression rule itself is
    * oracle-audited, not just its effect.
    *
    * 100 TB: one codegen'd projection (hash + floor) and ONE window
    * count over the (segment, band) grain — equivalently a broadcast
    * join of cell sizes; nothing beyond one exchange on the cell key.
    * Salted SHA-256 over the full column domain is the same kernel
    * class as q45's fingerprints; the q67 PII scrub redacts content,
    * this governs the RELEASE — complementary halves of the
    * compliance story with q133's purge.
    */
  def maskedExport(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment", "band")
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        substring(sha2(concat(col("c_name"), lit(":mask")), 256), 1, 16)
          .as("name_token"),
        expr("cast(floor(c_acctbal / 1000.0D) as bigint) * 1000")
          .as("band"))
      .withColumn("n_in_cell", count(lit(1)).over(w))
      .select(col("c_custkey"), col("c_mktsegment"), col("name_token"),
        when(col("n_in_cell") >= kAnonymity, col("band")).as("acct_band"),
        col("n_in_cell"))
      .orderBy("c_custkey")
  }

  /** The q202 contract's event-type domain — DELIBERATELY stale (it
    * predates the `error` type), so the domain rule fails: the exact
    * upstream-drift accident a data contract exists to catch, and a
    * deterministic fail row at every scale factor.
    */
  private[graft] val contractDomain = Seq("view", "click", "purchase", "signup")

  /** q202 — DATA-CONTRACT EXPECTATION GATE: a declarative rule table
    * (completeness, domain membership, key uniqueness, bounds)
    * evaluated against `events` in ONE stacked scan — the
    * Great-Expectations-style go/no-go every ingest edge runs before
    * publishing a batch (pairs with q179's write-audit-publish: this is
    * the AUDIT step as a reusable rule table). All observations are
    * exact integer ppm or raw values; `pass` is pure arithmetic, so the
    * whole verdict table is engine-re-derivable.
    *
    * Scale: one aggregation computes every rule's statistic (shared
    * scan, map-side combined); the unpivot to rule rows happens on the
    * SINGLE aggregate row. The uniqueness rule uses an exact distinct
    * (one extra shuffle at the key's grain) — at unbounded cardinality
    * the q160 HLL union replaces it under a tolerance, documented
    * trade.
    */
  def dataContract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        count(col("value")).as("n_value"),
        count(when(col("event_type").isin(contractDomain: _*), 1))
          .as("n_dom"),
        countDistinct(col("event_id")).as("n_dist"),
        min("user_id").as("min_user"))
      .selectExpr(
        s"""stack(4,
             'event_id_unique_ppm',
               CAST(CAST(n_dist AS DECIMAL(38,0)) * 1000000 div n AS BIGINT),
               1000000L,
             'type_in_domain_ppm',
               CAST(CAST(n_dom AS DECIMAL(38,0)) * 1000000 div n AS BIGINT),
               1000000L,
             'user_id_min', min_user, 0L,
             'value_not_null_ppm',
               CAST(CAST(n_value AS DECIMAL(38,0)) * 1000000 div n AS BIGINT),
               900000L) AS (rule, observed, threshold)""")
      .withColumn("pass", col("observed") >= col("threshold"))
      .orderBy("rule")

  /** q205 — EXACT DISTRIBUTED AUC from rank statistics: per source, the
    * ROC area of "n_chars predicts lang = 'en'" via the Mann-Whitney
    * identity AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) — the classifier
    * evaluation a 100 TB scoring pipeline needs WITHOUT collecting
    * scores to a driver (sklearn-style per-point curves do not scale;
    * the rank identity is pure aggregation). Ties get midranks, kept
    * integral by working with 2·rank throughout; the single division is
    * the last step, so the whole statistic is exact integer ppm.
    *
    * Scale: scores collapse to VALUE GRAIN first (one hash agg —
    * |distinct scores| rows, not |rows|); the cumulative count is a
    * window over that value-grain frame partitioned by group. Σ2·rank
    * passes 2⁶³ at ~3e9 rows/group → DECIMAL(38,0) throughout. A group
    * with no positives or no negatives has undefined AUC → null
    * (nullif).
    */
  def aucRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables.documents(spark, dir)
      .groupBy("source", "n_chars")
      .agg(count(lit(1)).as("cnt"),
        count(when(col("lang") === "en", 1)).as("pos"))
    val c = v.withColumn("cumb",
      coalesce(sum("cnt").over(
        Window.partitionBy("source").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    c.groupBy("source")
      .agg(sum("pos").as("n_pos"),
        sum(expr("cnt - pos")).as("n_neg"),
        sum(expr("CAST(pos AS DECIMAL(38,0)) * (2 * cumb + cnt + 1)"))
          .as("s2"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        expr("""CAST((s2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))
                  * 1000000 div nullif(2 * CAST(n_pos AS DECIMAL(38,0))
                  * n_neg, 0) AS BIGINT)""").as("auc_ppm"))
      .orderBy("source")
  }

  /** q279 — TIE-AWARE AVERAGE PRECISION (PR-curve area) per source, the
    * precision-recall companion to q205's AUC on the same honest proxy
    * task (n_chars ranking lang = 'en'): AUC is insensitive to class
    * imbalance, AP is what retrieval/filter pipelines actually gate on
    * when positives are rare. Convention stated explicitly: tied scores
    * form a BLOCK, every positive in a block contributes the precision
    * at the block's END — a deterministic, intra-tie-order-independent
    * definition (sklearn's step-function AP needs a total order; at
    * engine scale a tie order is an implementation accident, so the
    * block form is the honest cross-engine contract, and the oracle
    * replays it verbatim). Each block term is one truncating ppm
    * division; the final div by n_pos is the only other division.
    *
    * Scale: q205's exact shape — one hash agg to (source, score) value
    * grain, a window over that bounded frame, one dimension-sized
    * final agg. Σ pos·prec_ppm ≤ n_pos·10⁶ wraps BIGINT past ~9·10¹²
    * positives → DECIMAL(38,0).
    */
  def averagePrecision(spark: SparkSession, dir: String): DataFrame =
    apCore(Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), col("lang")))

  private[graft] def apCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = docs.groupBy("source", "n_chars")
      .agg(count(lit(1)).as("cnt"),
        count(when(col("lang") === "en", 1)).as("pos"))
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    v.withColumn("cum_cnt", sum("cnt").over(w))
      .withColumn("cum_pos", sum("pos").over(w))
      .groupBy("source")
      .agg(sum("pos").as("n_pos"), sum(expr("cnt - pos")).as("n_neg"),
        sum(expr("""cast(pos as decimal(38,0))
                    * (cast(cum_pos as decimal(38,0)) * 1000000
                       div cum_cnt)""")).as("num"))
      .select(col("source"), col("n_pos"), col("n_neg"),
        expr("cast(num div nullif(n_pos, 0) as bigint)").as("ap_ppm"))
      .orderBy("source")
  }

  /** q280 rank cutoff. */
  private[graft] val ndcgK = 10

  /** q280 discount table: d_i = ⌊10¹² / log₂(i+1)⌋, COMPUTED ONCE in
    * Scala and injected as integer literals into BOTH engines' plans —
    * neither engine evaluates a log at query time, so the statistic is
    * exact-integer despite the float-looking definition (the q271 RBO
    * weight trick).
    */
  private[graft] val ndcgDiscounts: Seq[(Long, Long)] =
    (1 to ndcgK).map(i =>
      (i.toLong, (1e12 * math.log(2) / math.log(i + 1.0)).toLong))
  private[graft] val ndcgIdcgPrefix: Seq[(Long, Long)] =
    (0 to ndcgK).map(m => (m.toLong, ndcgDiscounts.take(m).map(_._2).sum))

  /** q280 — NDCG@10 per source on the q205 proxy task (ranking by
    * n_chars desc, binary gain lang = 'en'): the position-discounted
    * ranking metric leaderboards report, completing the ranking-eval
    * family (q205 AUC = threshold-free ordering, q279 AP = PR area,
    * q271 RBO = ranker agreement, q245 RRF = ranker fusion). The
    * ranking key (n_chars desc, doc_id asc) is a unique total order, so
    * every rank — and the whole statistic — is engine-independent.
    * IDCG truncates at min(k, n_pos) as usual; a source with zero
    * positives reports 0 (documented convention, and null would
    * re-hydrate as NaN in the gate's pandas compare).
    *
    * Scale: the naive per-source full sort (`row_number` over the
    * whole source) is the q227-class hot-key trap, so the top-k rows
    * are pre-pruned at VALUE grain first: a window over the bounded
    * (source, n_chars) frame finds each source's k-th-block threshold,
    * a broadcast-joined scan filter keeps only rows in blocks that
    * intersect the top k, and the row-grain window ranks survivors
    * only (≤ k + one tie block per source — the key-grain bound). The
    * oracle is the NAIVE full-window form, so every run re-proves the
    * prune lossless.
    */
  def ndcgAtK(spark: SparkSession, dir: String): DataFrame =
    ndcgCore(Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), col("doc_id"), col("lang")))

  private[graft] def ndcgCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = docs.sparkSession
    import s.implicits._
    val k = ndcgK
    // n_chars IS NOT NULL symmetrically here and in the oracle (r12
    // ADVICE): the value-grain prune below silently drops NULL-score
    // rows while a naive window ranks them NULLS LAST — under nullable
    // inputs with < k non-null rows the prune would not be lossless.
    // q269/q277 already take this stance; q280 now matches.
    val base = docs.filter(col("n_chars").isNotNull)
      .select(col("source"), col("n_chars"), col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("rel"))
    // value-grain threshold: the smallest n_chars whose block still
    // intersects the top k (cum count BEFORE the block < k)
    val v = base.groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
    val wv = Window.partitionBy("source").orderBy(col("n_chars").desc)
    val thr = v.withColumn("cum_before",
        coalesce(sum("cnt").over(
          wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < k)
      .groupBy("source").agg(min("n_chars").as("thr"))
    val surv = base.join(broadcast(thr), Seq("source"))
      .filter(col("n_chars") >= col("thr"))
    val wr = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val disc = broadcast(ndcgDiscounts.toDF("rn", "d"))
    val dcg = surv.withColumn("rn", row_number().over(wr).cast("long"))
      .filter(col("rn") <= k)
      .join(disc, Seq("rn"))
      .groupBy("source").agg(sum(expr("rel * d")).as("dcg"))
    val idcg = broadcast(ndcgIdcgPrefix.toDF("m", "idcg"))
    base.groupBy("source").agg(sum("rel").as("n_pos"))
      .join(dcg, Seq("source"), "left")
      .na.fill(0L, Seq("dcg"))
      .withColumn("m", least(lit(k.toLong), col("n_pos")))
      .join(idcg, Seq("m"))
      .select(col("source"), col("n_pos"), col("dcg"),
        expr("""coalesce(cast(cast(dcg as decimal(38,0)) * 1000000
                div nullif(idcg, 0) as bigint), 0)""").as("ndcg_ppm"))
      .orderBy("source")
  }

  /** q210 — SOURCE-MIX DRIFT as exact total-variation distance: per
    * document source, how far its language mix sits from the corpus-
    * wide language distribution, in ppm — the categorical complement
    * to q142 (whose PSI deciles fence a NUMERIC feature) and the
    * curation pre-flight behind "which crawl source is skewing the
    * training mix". TV = ½·Σ_lang |p_source(lang) − p_corpus(lang)|
    * is the standard bounded distance for categorical mixes (no log,
    * no division per term — unlike KL it needs no smoothing for
    * zero cells).
    *
    * Exact integers throughout: with per-cell counts n_sl, per-lang
    * totals n_l, per-source totals n_s and the corpus total N,
    * TV_ppm = Σ|n_sl·N − n_l·n_s| · 10⁶ div (2·n_s·N) — one
    * truncating division after an exact DECIMAL(38,0) sum (n_sl·N
    * passes 2⁶³ near 10⁹·10¹⁰-row corpora; decimal keeps the 100 TB
    * claim honest). Missing cells matter — a source with ZERO docs of
    * a corpus language still drifts by that language's whole mass —
    * so the cell table densifies over the source×lang spine before
    * the sum (both dimensions are bounded vocabularies, not data-
    * scale; the spine is a broadcast cross of two tiny distincts).
    *
    * Scale: one full-data hash agg to (source, lang) cells; every
    * join after it is over bounded-cardinality aggregates.
    */
  def sourceMixTv(spark: SparkSession, dir: String): DataFrame =
    mixTvCore(Tables.documents(spark, dir)
      .select(col("source"), col("lang")))

  private[graft] def mixTvCore(docs: DataFrame): DataFrame = {
    val cell = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_sl"))
    val byLang = cell.groupBy("lang").agg(sum("n_sl").as("n_l"))
    val bySrc = cell.groupBy("source").agg(sum("n_sl").as("n_s"))
    val total = cell.agg(sum("n_sl").as("n_total"))
    val spine = cell.select("source").distinct()
      .crossJoin(broadcast(cell.select("lang").distinct()))
    spine
      .join(cell, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("n_sl"))
      .join(broadcast(byLang), "lang")
      .join(broadcast(bySrc), "source")
      .crossJoin(broadcast(total))
      .groupBy("source")
      .agg(max("n_s").as("n_docs"),
        sum(expr("""abs(cast(n_sl as decimal(38,0)) * n_total
                    - cast(n_l as decimal(38,0)) * n_s)"""))
          .as("dev"),
        max("n_total").as("nt"))
      .select(col("source"), col("n_docs"),
        expr("""cast(dev * 1000000
                div (2 * cast(n_docs as decimal(38,0)) * nt)
                as bigint)""").as("tv_ppm"))
      .orderBy("source")
  }

  /** q228 bin count (deciles — the reporting convention). */
  private[graft] val calibBuckets = 10

  /** q228 — CALIBRATION / RELIABILITY CURVE, the companion read to
    * q205's AUC: AUC says the score RANKS positives above negatives;
    * the reliability curve says what a score LEVEL means — per
    * equal-population score decile, the observed positive rate (same
    * honest proxy task as q205: n_chars predicting lang = 'en').
    * sklearn's calibration_curve collects scores to one node; here the
    * curve is pure aggregation.
    *
    * Deciles are assigned at VALUE-GROUP granularity (the q143
    * convention — equal scores never split across buckets; ntile's
    * arbitrary intra-tie split is both unscalable and semantically
    * worse), via the q218 two-phase prefix sum over the value-grain
    * frame: bucket = (cum_before·10) div n. Counts and rates are exact
    * integers; the single ppm division is truncating.
    *
    * Scale: one hash agg to value grain, the two-phase range exchange
    * over |distinct scores| rows, one dimension-sized final agg. No
    * single-partition window, no row-grain ordered pass.
    */
  def calibrationCurve(spark: SparkSession, dir: String): DataFrame =
    calibrationCore(Tables.documents(spark, dir)
      .select(col("n_chars"), col("lang")))

  private[graft] def calibrationCore(docs: DataFrame): DataFrame =
    GlobalIndex.prefixSummedBy(
        docs.groupBy("n_chars")
          .agg(count(lit(1)).as("cnt"),
            count(when(col("lang") === "en", 1)).as("pos")),
        Seq("n_chars"), Seq("cnt"))
      .withColumn("bucket",
        expr(s"(cum_cnt - cnt) * $calibBuckets div total_cnt"))
      .groupBy("bucket")
      .agg(sum("cnt").as("n_docs"), sum("pos").as("n_pos"),
        min("n_chars").as("lo_score"), max("n_chars").as("hi_score"))
      .select(col("bucket"), col("n_docs"), col("n_pos"),
        col("lo_score"), col("hi_score"),
        expr("""cast(cast(n_pos as decimal(38,0)) * 1000000 div n_docs
                as bigint)""").as("pos_rate_ppm"))
      .orderBy("bucket")

  /** l-diversity floor: a QI cell whose sensitive attribute shows fewer
    * than this many distinct values is re-identification-risky even
    * when k is satisfied (homogeneity attack).
    */
  private[graft] val lDiversity = 2

  /** q261 — K-ANONYMITY / L-DIVERSITY AUDIT: the measurement twin of
    * q187's governed export. q187 APPLIES the k rule (suppress small
    * cells); q261 MEASURES the release risk of a quasi-identifier
    * choice before any export is cut — per (segment, nation, order
    * priority) cell: k (row count), l (distinct sensitive price bands),
    * and the two risk flags — k < [[kAnonymity]] (re-identifiable
    * cell) and l < [[lDiversity]] (homogeneous cell: even an
    * anonymous match leaks the sensitive value — the classic
    * l-diversity gap k-anonymity alone misses).
    *
    * Scale: one equi-join customer⋈orders on the customer key (both
    * sides shuffle-partitioned on the key; neither is assumed
    * broadcast-small) and one hash agg on the QI columns —
    * count-distinct over the bounded band domain. Cell count is the
    * product of the QI cardinalities (bounded), never data-sized.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nation"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") / 50000).cast("long").as("price_bucket"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .groupBy("segment", "nation", "priority")
      .agg(count(lit(1)).as("k"),
        countDistinct(col("price_bucket")).as("l_div"))
      .withColumn("k_risk", col("k") < kAnonymity)
      .withColumn("l_risk", col("l_div") < lDiversity)
      .orderBy("segment", "nation", "priority")
  }

  /** q273 per-user contribution cap (the DP-style bound C: at most C
    * rows per user survive a bounded-contribution export).
    */
  private[graft] val contributionCap = 32L

  /** q273 — CONTRIBUTION-BOUNDING AUDIT: before a privacy-bounded (or
    * merely skew-bounded) training export clips each user to
    * [[contributionCap]] rows, measure what the clip would do — per
    * power-of-two contribution bucket: how many users land there, how
    * many rows they hold, how many survive the cap, how many are
    * clipped away, and the bucket's kept share. The q261 k-anonymity
    * audit asks "which cells identify"; this asks "who dominates" —
    * the per-user twin of q164's join-key skew read, at the user grain
    * a DP accountant bounds.
    *
    * All integers: bucket_lo = 2^⌊log2 n⌋ computed from the binary
    * string length (length(bin(n)) − 1 — no float log anywhere near an
    * integer boundary), kept = Σ min(n, C), clipped = Σ max(n − C, 0),
    * truncating ppm share.
    *
    * Scale: one map-side-combinable hash agg to user grain, one to the
    * ≤64-row bucket frame. Nothing else — no sort, no window over
    * rows.
    */
  def contributionCaps(spark: SparkSession, dir: String): DataFrame =
    contributionCapsCore(
      Tables.events(spark, dir).select(col("user_id")))

  /** Core over any (user_id) row frame — fixture seam. */
  private[graft] def contributionCapsCore(rows: DataFrame): DataFrame =
    rows.groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(
        expr("shiftleft(cast(1 as bigint), length(bin(n)) - 1)")
          .as("bucket_lo"),
        col("n"))
      .groupBy("bucket_lo")
      .agg(
        count(lit(1)).as("n_users"),
        sum("n").as("n_rows"),
        sum(least(col("n"), lit(contributionCap))).as("rows_kept"),
        sum(greatest(col("n") - contributionCap, lit(0L)))
          .as("rows_clipped"),
        max("n").as("max_contribution"))
      .withColumn("kept_share_ppm",
        // DECIMAL(38,0) before the *10⁶ (r12 ADVICE): a bucket's kept
        // rows past ~9.2e12 would wrap BIGINT silently where DuckDB
        // raises — the q198/q280 widening discipline, same values.
        expr("cast(cast(rows_kept as decimal(38,0)) * 1000000 div n_rows as bigint)"))
      .orderBy("bucket_lo")

  /** q269 forecast construction: the q228/q205 honest proxy task
    * (n_chars predicting lang = 'en'), mapped to a ppm "probability"
    * by a fixed monotone rule — 1000 ppm per char, saturating at 10⁶.
    * The rule caps the forecast-value domain at 1001 distinct values,
    * which is what keeps the decomposition frame dimension-sized.
    */
  private[graft] val brierPosLang = "en"

  /** q269 — BRIER SCORE + MURPHY DECOMPOSITION: the probabilistic-
    * forecast companion to q228's reliability curve and q205's AUC —
    * one row with the Brier score and its Murphy split into
    * reliability (calibration error), resolution (how much the
    * forecast separates outcomes), and uncertainty (base-rate
    * entropy), all in exact integer ppm² (forecast and outcome live
    * on the 10⁶ ppm scale, so squared gaps are ppm²). AUC says the
    * score ranks; q228 shows the curve; q269 is the single-number
    * audit trail ("is the model better than the base rate, and is the
    * gap calibration or discrimination?").
    *
    * Exactness: components are computed at forecast-VALUE grain
    * (f_b is exact, o_b = pos·10⁶ div n truncates once per group —
    * both engines truncate identically), squared gaps are BIGINT,
    * group-weighted sums ride DECIMAL(38,0) (n·10¹² per cell wraps a
    * BIGINT at ~10⁷ rows), and the final div-by-N is the last
    * operation. The Murphy identity holds only up to the documented
    * ppm truncation — the emitted numbers are each exact under their
    * own stated rule, which is what the oracle re-derives.
    *
    * Scale: one hash agg to the ≤1001-row forecast-value grain; the
    * corpus-total windows run over that bounded frame (the q199
    * cell-frame stance), never over rows.
    */
  def brierDecomposition(spark: SparkSession, dir: String): DataFrame =
    brierCore(Tables.documents(spark, dir).select(col("n_chars"), col("lang")))

  /** Core over any (n_chars, lang) frame — fixture seam. */
  private[graft] def brierCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs.filter(col("n_chars").isNotNull)
      .select(least(col("n_chars") * 1000, lit(1000000L)).as("f_ppm"),
        when(col("lang") === brierPosLang, 1L).otherwise(0L).as("y"))
      .groupBy("f_ppm")
      .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
      // DECIMAL before the ×10⁶: pos·10⁶ wraps a BIGINT past ~9·10¹²
      // positives (the q198 discipline)
      .withColumn("o_ppm",
        expr("CAST(CAST(pos_b AS DECIMAL(38,0)) * 1000000 div n_b AS BIGINT)"))
      .withColumn("n_tot", sum("n_b").over(w))
      .withColumn("obar_ppm",
        expr("""CAST(CAST(sum(pos_b) over (partition by 1) AS DECIMAL(38,0))
                * 1000000 div n_tot AS BIGINT)"""))
      .agg(
        max("n_tot").as("n_rows"),
        expr("""CAST(sum(CAST(pos_b AS DECIMAL(38,0))
                  * (1000000 - f_ppm) * (1000000 - f_ppm)
                  + CAST(n_b - pos_b AS DECIMAL(38,0)) * f_ppm * f_ppm)
                div max(n_tot) AS BIGINT)""").as("brier_ppm2"),
        expr("""CAST(sum(CAST(n_b AS DECIMAL(38,0))
                  * (f_ppm - o_ppm) * (f_ppm - o_ppm))
                div max(n_tot) AS BIGINT)""").as("reliability_ppm2"),
        expr("""CAST(sum(CAST(n_b AS DECIMAL(38,0))
                  * (o_ppm - obar_ppm) * (o_ppm - obar_ppm))
                div max(n_tot) AS BIGINT)""").as("resolution_ppm2"),
        // obar_ppm·(10⁶−obar_ppm) IS the ppm² value of ō(1−ō): each
        // factor carries one 10⁶ scale — no further normalization
        expr("CAST(max(obar_ppm) * (1000000 - max(obar_ppm)) AS BIGINT)")
          .as("uncertainty_ppm2"))
  }

  /** q277 — EXPECTED CALIBRATION ERROR: the L1 companion to q269's
    * Murphy decomposition and THE calibration number model evals
    * report — ECE = Σ_b (n_b/N)·|f_b − o_b| over forecast-value groups
    * plus MCE (the worst group's gap). q269's reliability term squares
    * the gaps (variance-flavored); ECE is the expected absolute
    * miscalibration a consumer of the scores actually experiences.
    * Same exactness rules as q269: value-grain o_b truncates once per
    * group, weighted sums ride DECIMAL(38,0), one final integral div.
    *
    * Scale: one hash agg to the ≤1001-row forecast-value grain, then a
    * single-row aggregate. Nothing row-scaled after the first agg.
    */
  def calibrationError(spark: SparkSession, dir: String): DataFrame =
    calibrationErrorCore(
      Tables.documents(spark, dir).select(col("n_chars"), col("lang")))

  /** Core over any (n_chars, lang) frame — fixture seam. */
  private[graft] def calibrationErrorCore(docs: DataFrame): DataFrame =
    docs.filter(col("n_chars").isNotNull)
      .select(least(col("n_chars") * 1000, lit(1000000L)).as("f_ppm"),
        when(col("lang") === brierPosLang, 1L).otherwise(0L).as("y"))
      .groupBy("f_ppm")
      .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
      .withColumn("o_ppm",
        expr("CAST(CAST(pos_b AS DECIMAL(38,0)) * 1000000 div n_b AS BIGINT)"))
      .agg(
        sum("n_b").as("n_rows"),
        expr("""CAST(sum(CAST(n_b AS DECIMAL(38,0)) * abs(f_ppm - o_ppm))
                div sum(n_b) AS BIGINT)""").as("ece_ppm"),
        max(abs(col("f_ppm") - col("o_ppm"))).as("mce_ppm"))

  /** q270 sample-count floor: pass@k needs n ≥ max(k). */
  private[graft] val passKs = Seq(1, 5, 10)

  /** The unbiased pass@k estimator 1 − C(n−c,k)/C(n,k) (Chen et al.
    * 2021), unrolled to the product Π_{i<k} (n−c−i)/(n−i). The SAME
    * generated string is fed to Spark's `expr` and embedded in the
    * DuckDB oracle, so both engines execute the identical IEEE-double
    * tree in the identical association order — cross-engine parity by
    * construction, not by accident (the q111 stance for the one float
    * division, extended to k of them).
    */
  private[graft] def passAtKSql(k: Int): String = {
    val prod = (0 until k).map(i =>
      s"(CAST(n_samples - n_correct - $i AS DOUBLE)" +
        s" / CAST(n_samples - $i AS DOUBLE))").mkString(" * ")
    s"""CASE WHEN n_samples - n_correct < $k THEN CAST(1 AS DOUBLE)
          ELSE round(CAST(1 AS DOUBLE) - $prod, 6) END"""
  }

  /** q270 — PASS@K ESTIMATION: per problem (user_id standing in for an
    * eval problem, `purchase` events for correct samples), the
    * unbiased pass@1/5/10 from n samples with c successes — the
    * standard coding-eval aggregation run over millions of sampled
    * generations. Per-problem rows only: the estimator is a pure
    * scalar on (n, c), so nothing float-aggregates across rows (a
    * mean-of-doubles would be partition-order-sensitive; callers
    * average the exact per-problem table however they like).
    *
    * Scale: one map-side-combinable hash agg to problem grain, then
    * per-row arithmetic. Nothing else.
    */
  def passAtKEstimates(spark: SparkSession, dir: String): DataFrame =
    passAtKCore(Tables.events(spark, dir)
      .select(col("user_id").as("problem_id"),
        (col("event_type") === "purchase").as("ok")))

  /** Core over any (problem_id, ok) frame — fixture seam. */
  private[graft] def passAtKCore(samples: DataFrame): DataFrame =
    samples.groupBy("problem_id")
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_correct"))
      .filter(col("n_samples") >= passKs.max)
      .select(Seq(col("problem_id"), col("n_samples"), col("n_correct")) ++
        passKs.map(k => expr(passAtKSql(k)).as(s"pass_at_$k")): _*)
      .orderBy("problem_id")

  /** q296 — PARETO-FRONT CURATION FILTER: per source, the documents
    * not dominated on the (maximize word count, minimize characters)
    * trade-off — the "most content for the fewest bytes" efficient
    * frontier a curation pass keeps when it can't afford a scalar
    * weighting of the two objectives (any single composite score picks
    * ONE point of this front; the front itself is the
    * weighting-independent answer). Dominance is the standard strict
    * form: A dominates B iff A.n_words ≥ B.n_words ∧ A.n_chars ≤
    * B.n_chars with at least one strict; exact ties are mutually
    * non-dominating and all kept.
    *
    * Scale: never the O(n²) pairwise dominance test. The 2-D front
    * factors through the value grain — a doc survives iff (a) its
    * n_chars is the minimum within its (source, n_words) group and
    * (b) every strictly-greater n_words group's min-chars is strictly
    * above its own — so the whole filter is one hash agg to the
    * (source, n_words) grain plus a running-min window over that
    * VALUE-GRAIN frame (bounded by distinct word counts, the q199
    * cell-frame stance — partition-by-source is safe here because the
    * windowed frame is value-distinct-sized, never corpus-sized) and
    * one equi-join back.
    */
  def paretoFront(spark: SparkSession, dir: String): DataFrame =
    paretoFrontCore(Tables.spread(Tables.documents(spark, dir)))

  /** Core over any (doc_id, source, text, n_chars) frame — fixture
    * seam for the spec.
    */
  private[graft] def paretoFrontCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("source"),
        size(graft.expr.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_words"),
        col("n_chars"))
    val grp = d.groupBy("source", "n_words")
      .agg(min("n_chars").as("grp_min_chars"))
    val prevBetter = Window.partitionBy("source")
      .orderBy(col("n_words").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = grp.withColumn("run_min_prev",
      min("grp_min_chars").over(prevBetter))
    d.join(run, Seq("source", "n_words"))
      .filter(col("n_chars") === col("grp_min_chars") &&
        (col("run_min_prev").isNull ||
          col("run_min_prev") > col("n_chars")))
      .select("doc_id", "source", "n_words", "n_chars")
      .orderBy("doc_id")
  }

  /** q307 importance-feature space: hashed unigram buckets (first two
    * md5 hex chars → 0..255) and the target-domain language.
    */
  private[graft] val dsirBuckets = 256
  private[graft] val dsirTargetLang = "en"

  /** q307 — DSIR-STYLE IMPORTANCE SCORE (the hashed-n-gram importance
    * resampling weight of Xie et al. 2023, integerized): score every
    * document by how target-like its token distribution is, where the
    * feature space is hashed unigram BUCKETS (md5 first-two-hex-chars
    * → 256 buckets — the q58 hash-decision discipline at the word
    * grain) and the target is the `en` slice of the corpus (the
    * deterministic stand-in for "high-quality domain"). Per bucket b,
    * the add-1-smoothed likelihood ratio in exact truncating ppm:
    * ratio_ppm(b) = (tgt_b + 1)·10⁶ div (src_b + 1); per document the
    * order-free integer mass Σ_b tf(b)·ratio_ppm(b) and its per-token
    * mean — the ranking key a DSIR selection run feeds to top-k /
    * budget selection (q286's boundary kernel composes directly).
    * Deliberately a sum of exact integer ratio terms, not a float
    * log-likelihood: bit-replayable in any engine, association-order-
    * free, and monotone in the same direction for ranking.
    *
    * Scale: two hash aggs ((doc, bucket) tf and the per-bucket corpus
    * counts) + ONE broadcast join against the ≤256-row ratio table —
    * no data-sized shuffle beyond the tf collapse; the feature space
    * is constant-size by construction, the DSIR trick that makes
    * importance weighting feasible at web scale.
    */
  def dsirImportance(spark: SparkSession, dir: String): DataFrame =
    dsirImportanceCore(Tables.spread(Tables.documents(spark, dir)))

  /** Core over any (doc_id, lang, text) frame — fixture seam. */
  private[graft] def dsirImportanceCore(docs: DataFrame): DataFrame = {
    val toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(graft.expr.TextFunctions.tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(col("w").cast("binary")), 1, 2), 16, 10)
          .cast("long").as("b"))
    val srcCnt = toks.groupBy("b").agg(count(lit(1)).as("src"))
    val tgtCnt = toks.filter(col("lang") === dsirTargetLang)
      .groupBy("b").agg(count(lit(1)).as("tgt"))
    val ratio = srcCnt.join(tgtCnt, Seq("b"), "left")
      .na.fill(0L, Seq("tgt"))
      .select(col("b"),
        expr("(tgt + 1) * 1000000 div (src + 1)").as("ratio_ppm"))
    val tf = toks.groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tok"),
        sum(expr("cast(tf as decimal(38,0)) * ratio_ppm")).as("mass"))
      .select(col("doc_id"), col("n_tok"),
        expr("cast(mass as bigint)").as("lr_mass"),
        expr("cast(mass div n_tok as bigint)").as("lr_mean_ppm"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q307_dsir_importance" -> (dsirImportance(_, _)),
    "q296_pareto_front" -> (paretoFront(_, _)),
    "q261_k_anonymity" -> (kAnonymityAudit(_, _)),
    "q273_contribution_caps" -> (contributionCaps(_, _)),
    "q269_brier_decomposition" -> (brierDecomposition(_, _)),
    "q270_pass_at_k" -> (passAtKEstimates(_, _)),
    "q277_calibration_error" -> (calibrationError(_, _)),
    "q228_calibration_curve" -> (calibrationCurve(_, _)),
    "q210_source_mix_tv" -> (sourceMixTv(_, _)),
    "q205_auc_rank" -> (aucRank(_, _)),
    "q279_average_precision" -> (averagePrecision(_, _)),
    "q280_ndcg_at_k" -> (ndcgAtK(_, _)),
    "q202_data_contract" -> (dataContract(_, _)),
    "q187_masked_export" -> (maskedExport(_, _)),
    "q157_fd_audit" -> (fdAudit(_, _)),
    "q158_independence_lift" -> (independenceLift(_, _)),
    "q253_chi_square_independence" -> (chiSquareIndependence(_, _)),
    "q153_benford_digits" -> (benfordDigits(_, _)),
    "q129_fk_integrity" -> (fkIntegrity(_, _)),
    "q240_joinability_profile" -> (joinabilityProfile(_, _)),
    "q130_incremental_rollup" -> (incrementalRollup(_, _)),
    "q133_compliance_purge" -> (compliancePurge(_, _)))

  /** One joinability probe in DuckDB — same distinct key sets, same
    * inner-join overlap, same truncating ppm divisions.
    */
  private def joinabilitySql(pair: String, ta: String, ca: String,
                             tb: String, cb: String): String =
    s"""SELECT '$pair' AS pair, n_a, n_b, n_both,
          n_both * 1000000 // nullif(n_a, 0) AS a_in_b_ppm,
          n_both * 1000000 // nullif(n_b, 0) AS b_in_a_ppm,
          n_both * 1000000 // nullif(n_a + n_b - n_both, 0) AS jaccard_ppm
        FROM (SELECT
          (SELECT count(DISTINCT $ca) FROM $ta
             WHERE $ca IS NOT NULL)::BIGINT AS n_a,
          (SELECT count(DISTINCT $cb) FROM $tb
             WHERE $cb IS NOT NULL)::BIGINT AS n_b,
          (SELECT count(*) FROM
            (SELECT DISTINCT $ca AS k FROM $ta WHERE $ca IS NOT NULL) x
            JOIN (SELECT DISTINCT $cb AS k FROM $tb
                    WHERE $cb IS NOT NULL) y USING (k))::BIGINT AS n_both)"""

  val oracles: Map[String, String] = Map(
    // q307: same md5-two-hex-char bucket (the '0x' cast = Spark's
    // conv(...,16,10)), same add-1 truncating ratio, same exact
    // integer mass in HUGEINT
    "q307_dsir_importance" ->
      s"""WITH toks AS (
            SELECT doc_id, lang,
              ('0x' || substr(md5(w), 1, 2))::BIGINT AS b
            FROM (SELECT doc_id, lang,
                    unnest(list_filter(string_split(text, ' '),
                      w -> w <> '')) AS w
                  FROM documents WHERE text IS NOT NULL)),
          src AS (SELECT b, count(*)::BIGINT AS src FROM toks GROUP BY 1),
          tgt AS (SELECT b, count(*)::BIGINT AS tgt FROM toks
                  WHERE lang = '$dsirTargetLang' GROUP BY 1),
          ratio AS (
            SELECT s.b,
              ((coalesce(t.tgt, 0) + 1) * 1000000 // (s.src + 1))
                ::BIGINT AS ratio_ppm
            FROM src s LEFT JOIN tgt t ON t.b = s.b),
          tf AS (SELECT doc_id, b, count(*)::BIGINT AS tf
                 FROM toks GROUP BY 1, 2)
          SELECT doc_id, sum(tf)::BIGINT AS n_tok,
            sum(tf::HUGEINT * ratio_ppm)::BIGINT AS lr_mass,
            (sum(tf::HUGEINT * ratio_ppm) // sum(tf))::BIGINT
              AS lr_mean_ppm
          FROM tf JOIN ratio USING (b)
          GROUP BY doc_id ORDER BY doc_id""",
    // q296: same whitespace token contract as q291, same value-grain
    // group collapse, running-min window and dominance predicate
    "q296_pareto_front" ->
      """WITH d AS (
            SELECT doc_id, source,
              len(list_filter(string_split(text, ' '), w -> w <> ''))
                ::BIGINT AS n_words,
              n_chars
            FROM documents
            WHERE text IS NOT NULL AND n_chars IS NOT NULL),
          g AS (
            SELECT source, n_words, min(n_chars)::BIGINT AS grp_min_chars
            FROM d GROUP BY 1, 2),
          r AS (
            SELECT *, min(grp_min_chars) OVER (
                PARTITION BY source ORDER BY n_words DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS run_min_prev
            FROM g)
          SELECT doc_id, d.source, d.n_words, n_chars
          FROM d JOIN r ON d.source = r.source AND d.n_words = r.n_words
          WHERE n_chars = grp_min_chars
            AND (run_min_prev IS NULL OR run_min_prev > n_chars)
          ORDER BY doc_id""",
    // q269: same saturating forecast rule, same value-grain truncating
    // o_ppm, same decimal-exact weighted sums (HUGEINT), same final
    // integral div
    "q269_brier_decomposition" ->
      s"""WITH g AS (
            SELECT least(n_chars * 1000, 1000000) AS f_ppm,
              count(*)::HUGEINT AS n_b,
              sum(CASE WHEN lang = '$brierPosLang' THEN 1 ELSE 0 END)::HUGEINT
                AS pos_b
            FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
          e AS (
            SELECT f_ppm, n_b, pos_b,
              pos_b * 1000000 // n_b AS o_ppm,
              sum(n_b) OVER () AS n_tot,
              (sum(pos_b) OVER () * 1000000) // sum(n_b) OVER () AS obar_ppm
            FROM g)
          SELECT max(n_tot)::BIGINT AS n_rows,
            (sum(pos_b * (1000000 - f_ppm) * (1000000 - f_ppm)
               + (n_b - pos_b) * f_ppm * f_ppm) // max(n_tot))::BIGINT
              AS brier_ppm2,
            (sum(n_b * (f_ppm - o_ppm) * (f_ppm - o_ppm))
               // max(n_tot))::BIGINT AS reliability_ppm2,
            (sum(n_b * (o_ppm - obar_ppm) * (o_ppm - obar_ppm))
               // max(n_tot))::BIGINT AS resolution_ppm2,
            (max(obar_ppm) * (1000000 - max(obar_ppm)))::BIGINT
              AS uncertainty_ppm2
          FROM e""",
    // q277: same saturating forecast rule and value-grain o_ppm as
    // q269, HUGEINT weighted |gaps|, one final integral div
    "q277_calibration_error" ->
      s"""WITH g AS (
            SELECT least(n_chars * 1000, 1000000) AS f_ppm,
              count(*)::HUGEINT AS n_b,
              sum(CASE WHEN lang = '$brierPosLang' THEN 1 ELSE 0 END)::HUGEINT
                AS pos_b
            FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
          e AS (
            SELECT f_ppm, n_b, pos_b,
              pos_b * 1000000 // n_b AS o_ppm
            FROM g)
          SELECT sum(n_b)::BIGINT AS n_rows,
            (sum(n_b * abs(f_ppm - o_ppm)) // sum(n_b))::BIGINT AS ece_ppm,
            max(abs(f_ppm - o_ppm))::BIGINT AS mce_ppm
          FROM e""",
    // q270: same problem-grain counts; the estimator fragment is the
    // SAME generated string both engines execute (see passAtKSql)
    "q270_pass_at_k" ->
      s"""WITH g AS (
            SELECT user_id AS problem_id, count(*)::BIGINT AS n_samples,
              sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
                AS n_correct
            FROM events GROUP BY 1)
          SELECT problem_id, n_samples, n_correct,
            ${passKs.map(k => s"(${passAtKSql(k)}) AS pass_at_$k")
              .mkString(", ")}
          FROM g WHERE n_samples >= ${passKs.max} ORDER BY problem_id""",
    // q273: same user-grain collapse, same bin-length power-of-two
    // bucket, same min/max clip algebra, same truncating ppm share
    "q273_contribution_caps" ->
      s"""WITH u AS (
            SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY 1),
          b AS (
            SELECT (1::BIGINT << (length(bin(n)) - 1)) AS bucket_lo, n
            FROM u)
          SELECT bucket_lo, count(*)::BIGINT AS n_users,
            sum(n)::BIGINT AS n_rows,
            sum(least(n, $contributionCap))::BIGINT AS rows_kept,
            sum(greatest(n - $contributionCap, 0))::BIGINT AS rows_clipped,
            max(n)::BIGINT AS max_contribution,
            (sum(least(n, $contributionCap))::HUGEINT * 1000000
              // sum(n))::BIGINT AS kept_share_ppm
          FROM b GROUP BY 1 ORDER BY 1""",
    // q261: same join, same QI cells, same floor-banded sensitive
    // attribute, same risk thresholds
    "q261_k_anonymity" ->
      s"""WITH joined AS (
            SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
              o.o_orderpriority AS priority,
              floor(o.o_totalprice / 50000)::BIGINT AS price_bucket
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey)
          SELECT segment, nation, priority, count(*)::BIGINT AS k,
            count(DISTINCT price_bucket)::BIGINT AS l_div,
            (count(*) < $kAnonymity) AS k_risk,
            (count(DISTINCT price_bucket) < $lDiversity) AS l_risk
          FROM joined GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // q240: per pair, same distinct sets / overlap / ppm rules
    "q240_joinability_profile" -> (Seq(
      ("events.user_id~customer.c_custkey",
        "events", "user_id", "customer", "c_custkey"),
      ("lineitem.l_partkey~supplier.s_suppkey",
        "lineitem", "l_partkey", "supplier", "s_suppkey"),
      ("lineitem.l_suppkey~supplier.s_suppkey",
        "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation.n_nationkey~region.r_regionkey",
        "nation", "n_nationkey", "region", "r_regionkey"),
      ("orders.o_custkey~customer.c_custkey",
        "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier.s_suppkey~customer.c_custkey",
        "supplier", "s_suppkey", "customer", "c_custkey"))
      .map { case (p, ta, ca, tb, cb) => joinabilitySql(p, ta, ca, tb, cb) }
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY pair")),
    // q228: same value-grain collapse, same value-group bucket rule
    // ((cum_before·10) div n — a tie never splits), same ppm division
    "q228_calibration_curve" ->
      """WITH g AS (
           SELECT n_chars, count(*)::BIGINT AS cnt,
             count(*) FILTER (WHERE lang = 'en')::BIGINT AS pos
           FROM documents GROUP BY 1),
         c AS (
           SELECT *,
             sum(cnt) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER () AS n
           FROM g)
         SELECT ((cum - cnt) * 10 // n)::BIGINT AS bucket,
           sum(cnt)::BIGINT AS n_docs, sum(pos)::BIGINT AS n_pos,
           min(n_chars)::BIGINT AS lo_score,
           max(n_chars)::BIGINT AS hi_score,
           (sum(pos)::HUGEINT * 1000000 // sum(cnt))::BIGINT
             AS pos_rate_ppm
         FROM c GROUP BY 1 ORDER BY 1""",
    // q210: same densified source×lang spine, same cross-multiplied
    // integer deviation in HUGEINT, one truncating division
    "q210_source_mix_tv" ->
      """WITH cell AS (
           SELECT source, lang, count(*)::BIGINT AS n_sl
           FROM documents GROUP BY 1, 2),
         l AS (SELECT lang, sum(n_sl)::BIGINT AS n_l FROM cell GROUP BY 1),
         s AS (SELECT source, sum(n_sl)::BIGINT AS n_s FROM cell GROUP BY 1),
         t AS (SELECT sum(n_sl)::BIGINT AS n_total FROM cell),
         spine AS (
           SELECT ds.source, dl.lang
           FROM (SELECT DISTINCT source FROM cell) ds
           CROSS JOIN (SELECT DISTINCT lang FROM cell) dl),
         f AS (
           SELECT spine.source, spine.lang,
             coalesce(cell.n_sl, 0)::BIGINT AS n_sl
           FROM spine LEFT JOIN cell USING (source, lang))
         SELECT f.source, max(s.n_s)::BIGINT AS n_docs,
           (sum(abs(f.n_sl::HUGEINT * t.n_total - l.n_l::HUGEINT * s.n_s))
            * 1000000
            // (2 * max(s.n_s)::HUGEINT * max(t.n_total)))::BIGINT
             AS tv_ppm
         FROM f JOIN l USING (lang) JOIN s USING (source) CROSS JOIN t
         GROUP BY 1 ORDER BY 1""",
    // q279: same value-grain blocks, same block-end precision
    // convention, same truncating integer chain in HUGEINT
    "q279_average_precision" ->
      """WITH v AS (
           SELECT source, n_chars AS s, count(*)::BIGINT AS cnt,
             count(*) FILTER (WHERE lang = 'en')::BIGINT AS pos
           FROM documents GROUP BY 1, 2),
         c AS (
           SELECT *,
             sum(cnt) OVER (PARTITION BY source ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cnt,
             sum(pos) OVER (PARTITION BY source ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos
           FROM v),
         a AS (
           SELECT source, sum(pos)::HUGEINT AS n_pos,
             sum(cnt - pos)::HUGEINT AS n_neg,
             sum(pos::HUGEINT * ((cum_pos::HUGEINT * 1000000) // cum_cnt))
               AS num
           FROM c GROUP BY 1)
         SELECT source, n_pos::BIGINT AS n_pos, n_neg::BIGINT AS n_neg,
           (num // nullif(n_pos, 0))::BIGINT AS ap_ppm
         FROM a ORDER BY source""",
    // q280: the NAIVE full per-source window (no prune) with the SAME
    // Scala-computed discount literals — agreement re-proves the
    // engine's value-grain top-k prune lossless on every run
    "q280_ndcg_at_k" -> {
      val dvals = ndcgDiscounts
        .map { case (i, d) => s"($i, $d)" }.mkString(", ")
      val ivals = ndcgIdcgPrefix
        .map { case (m, s) => s"($m, $s)" }.mkString(", ")
      s"""WITH base AS (
            SELECT source, n_chars, doc_id,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
            FROM documents WHERE n_chars IS NOT NULL),
          r AS (
            SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id) AS rn
            FROM base),
          d(rn, dv) AS (VALUES $dvals),
          dcg AS (
            SELECT source, sum(rel * dv)::BIGINT AS dcg
            FROM r JOIN d USING (rn) GROUP BY 1),
          np AS (
            SELECT source, sum(rel)::BIGINT AS n_pos FROM base GROUP BY 1),
          i(m, idcg) AS (VALUES $ivals)
          SELECT np.source, np.n_pos,
            coalesce(dcg.dcg, 0) AS dcg,
            coalesce((coalesce(dcg.dcg, 0)::HUGEINT * 1000000
              // nullif(i.idcg, 0))::BIGINT, 0) AS ndcg_ppm
          FROM np LEFT JOIN dcg ON np.source = dcg.source
          JOIN i ON i.m = least($ndcgK, np.n_pos)
          ORDER BY np.source"""
    },
    // q205: the same Mann-Whitney midrank identity in HUGEINT
    "q205_auc_rank" ->
      """WITH v AS (
           SELECT source, n_chars AS s, count(*)::BIGINT AS cnt,
             count(*) FILTER (WHERE lang = 'en')::BIGINT AS pos
           FROM documents GROUP BY 1, 2),
         c AS (
           SELECT *, coalesce(sum(cnt) OVER (PARTITION BY source
             ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS cumb
           FROM v),
         a AS (
           SELECT source, sum(pos)::HUGEINT AS n_pos,
             sum(cnt - pos)::HUGEINT AS n_neg,
             sum(pos::HUGEINT * (2 * cumb + cnt + 1)) AS s2
           FROM c GROUP BY 1)
         SELECT source, n_pos::BIGINT AS n_pos, n_neg::BIGINT AS n_neg,
           ((s2 - n_pos * (n_pos + 1)) * 1000000
            // nullif(2 * n_pos * n_neg, 0))::BIGINT AS auc_ppm
         FROM a ORDER BY source""",
    // q202: the same single-aggregate statistics unpivoted to rule rows
    "q202_data_contract" ->
      s"""WITH a AS (
            SELECT count(*)::BIGINT AS n,
              count(value)::BIGINT AS n_value,
              count(*) FILTER (WHERE event_type IN
                (${contractDomain.map(t => s"'$t'").mkString(", ")}))::BIGINT
                AS n_dom,
              count(DISTINCT event_id)::BIGINT AS n_dist,
              min(user_id) AS min_user
            FROM events),
          r AS (
            SELECT 'event_id_unique_ppm' AS rule,
              (n_dist::HUGEINT * 1000000 // n)::BIGINT AS observed,
              1000000::BIGINT AS threshold FROM a
            UNION ALL SELECT 'type_in_domain_ppm',
              (n_dom::HUGEINT * 1000000 // n)::BIGINT, 1000000 FROM a
            UNION ALL SELECT 'user_id_min', min_user, 0 FROM a
            UNION ALL SELECT 'value_not_null_ppm',
              (n_value::HUGEINT * 1000000 // n)::BIGINT, 900000 FROM a)
          SELECT rule, observed, threshold,
            observed >= threshold AS pass
          FROM r ORDER BY rule""",
    // q187: identical salted sha256 prefix, identical banding, and the
    // k rule re-derived from a window count — suppression must match
    // row for row, not just in aggregate
    "q187_masked_export" ->
      s"""SELECT c_custkey, c_mktsegment, name_token,
            CASE WHEN n_in_cell >= $kAnonymity THEN band END AS acct_band,
            n_in_cell
          FROM (
            SELECT c_custkey, c_mktsegment,
              substr(sha256(c_name || ':mask'), 1, 16) AS name_token,
              CAST(floor(c_acctbal / CAST(1000.0 AS DOUBLE)) AS BIGINT)
                * 1000 AS band,
              count(*) OVER (PARTITION BY c_mktsegment,
                CAST(floor(c_acctbal / CAST(1000.0 AS DOUBLE)) AS BIGINT))
                AS n_in_cell
            FROM customer)
          ORDER BY c_custkey""",
    // q157: same group-to-LHS-grain then collapse, independently
    // formulated with FILTER aggregates; HUGEINT sums cast back
    "q157_fd_audit" -> {
      def branch(rel: String, table: String, lhs: String, rhs: String) =
        s"""SELECT '$rel' AS dependency,
           count(*)::BIGINT AS n_lhs_groups,
           (count(*) FILTER (WHERE n_rhs > 1))::BIGINT AS n_violating,
           max(n_rhs)::BIGINT AS max_rhs,
           coalesce(sum(n_rows) FILTER (WHERE n_rhs > 1), 0)::BIGINT
             AS n_rows_in_violation
         FROM (SELECT count(DISTINCT $rhs) AS n_rhs, count(*) AS n_rows
               FROM $table GROUP BY $lhs) g"""
      Seq(
        branch("events: event_id -> user_id", "events", "event_id",
          "user_id"),
        branch("events: user_id -> event_type", "events", "user_id",
          "event_type"),
        branch("lineitem: (l_orderkey, l_linenumber) -> l_partkey",
          "lineitem", "l_orderkey, l_linenumber", "l_partkey"),
        branch("lineitem: l_orderkey -> l_suppkey", "lineitem",
          "l_orderkey", "l_suppkey"),
        branch("orders: o_custkey -> o_orderpriority", "orders",
          "o_custkey", "o_orderpriority"),
        branch("nation: n_nationkey -> n_regionkey", "nation",
          "n_nationkey", "n_regionkey"))
        .mkString("", "\n UNION ALL\n ", "\n ORDER BY dependency")
    },
    // q253: same full-grid contingency construction (zero cells via a
    // margin cross product), same HUGEINT fixed-point cell formula
    "q253_chi_square_independence" ->
      """WITH fact AS (
           SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         cells AS (
           SELECT seg, prio, count(*)::BIGINT AS n_obs
           FROM fact GROUP BY 1, 2),
         rm AS (SELECT seg, sum(n_obs)::BIGINT AS rt FROM cells GROUP BY 1),
         cm AS (SELECT prio, sum(n_obs)::BIGINT AS ct FROM cells GROUP BY 1),
         tot AS (SELECT sum(n_obs)::BIGINT AS n FROM cells),
         grid AS (
           SELECT rm.seg, cm.prio, rm.rt, cm.ct, tot.n,
             coalesce(cells.n_obs, 0)::BIGINT AS o
           FROM rm CROSS JOIN cm CROSS JOIN tot
           LEFT JOIN cells ON cells.seg = rm.seg AND cells.prio = cm.prio),
         percell AS (
           SELECT n,
             ((o::HUGEINT * n - rt::HUGEINT * ct)
              * (o::HUGEINT * n - rt::HUGEINT * ct) * 1000000)
             // (n::HUGEINT * rt * ct) AS cell_e6,
             seg, prio
           FROM grid)
         SELECT count(*)::BIGINT AS n_cells,
           max(n)::BIGINT AS n_rows,
           ((count(DISTINCT seg) - 1) * (count(DISTINCT prio) - 1))::BIGINT
             AS dof,
           sum(cell_e6)::BIGINT AS chi2_e6
         FROM percell""",
    // q158: margins re-derived from the same single-pass counts; the
    // ppm lift is one HUGEINT integer division — no floats anywhere
    "q158_independence_lift" ->
      """WITH ev AS (
           SELECT event_type,
             ((epoch_ns(ts) // 1000 // 86400000000) + 3) % 7 AS dow
           FROM events WHERE ts IS NOT NULL),
         cells AS (
           SELECT event_type, dow, count(*) AS n_obs FROM ev GROUP BY 1, 2),
         bt AS (SELECT event_type, count(*) AS n_type FROM ev GROUP BY 1),
         bd AS (SELECT dow, count(*) AS n_dow FROM ev GROUP BY 1),
         t AS (SELECT count(*) AS n_total FROM ev)
         SELECT c.event_type, c.dow, n_obs, n_type, n_dow, n_total,
           ((n_obs::HUGEINT * n_total * 1000000)
             // (n_type::HUGEINT * n_dow))::BIGINT AS lift_ppm
         FROM cells c JOIN bt USING (event_type) JOIN bd USING (dow), t
         ORDER BY 1, 2""",
    // q153: same nine shared ppm literals, same floor→BIGINT→first-char
    // digit extraction, same integer division — no transcendental, no
    // float anywhere
    "q153_benford_digits" -> {
      val caseExpr = benfordPpm.toSeq.sortBy(_._1)
        .map { case (dg, ppm) => s"WHEN $dg THEN ${ppm}" }
        .mkString("CASE digit ", " ", " END")
      s"""WITH c AS (
           SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT
               AS digit,
             count(*) AS n
           FROM orders WHERE o_totalprice >= 1 GROUP BY 1)
         SELECT digit, n,
           (n * 1000000) // (sum(n) OVER ())::BIGINT AS obs_ppm,
           ($caseExpr)::BIGINT AS benford_ppm,
           abs((n * 1000000) // (sum(n) OVER ())::BIGINT
             - ($caseExpr)::BIGINT) AS dev_ppm
         FROM c ORDER BY digit"""
    },
    // q129: one FULL JOIN per relation at key grain — the same
    // two-sided accounting, independently formulated. sum(BIGINT) is
    // HUGEINT in DuckDB → every aggregate casts back to BIGINT
    // (OracleTypeSpec's DECIMAL/HUGEINT output ban).
    "q129_fk_integrity" -> {
      def branch(rel: String, child: String, key: String,
                 parent: String, pkey: String, pwhere: String) =
        s"""SELECT '$rel' AS relation,
           coalesce(sum(cnt), 0)::BIGINT AS n_child,
           coalesce(sum(CASE WHEN hit IS NULL THEN cnt END), 0)::BIGINT
             AS n_orphan,
           count(CASE WHEN hit IS NULL THEN k END)::BIGINT AS n_orphan_keys,
           count(hit)::BIGINT AS n_parent,
           count(CASE WHEN cnt IS NULL THEN k END)::BIGINT AS n_childless
         FROM (SELECT $key AS k, count(*)::BIGINT AS cnt
               FROM $child GROUP BY 1) c
         FULL JOIN (SELECT $pkey AS k, 1 AS hit FROM $parent $pwhere) p
           USING (k)"""
      Seq(
        branch("events.user_id->customer",
          "events", "user_id", "customer", "c_custkey", ""),
        branch("events.user_id->customer[AUTOMOBILE]",
          "events", "user_id", "customer", "c_custkey",
          "WHERE c_mktsegment = 'AUTOMOBILE'"),
        branch("lineitem.l_orderkey->orders",
          "lineitem", "l_orderkey", "orders", "o_orderkey", ""),
        branch("orders.o_custkey->customer",
          "orders", "o_custkey", "customer", "c_custkey", ""))
        .mkString("", "\nUNION ALL ", "\nORDER BY relation")
    },
    // q130: the oracle is the DIRECT one-pass aggregate — deliberately
    // blind to the base/delta split, so a wrong merge formula (count of
    // counts, float re-sum) hash-mismatches.
    "q130_incremental_rollup" ->
      """SELECT event_type, count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 2) AS value_sum,
           min(epoch_ns(ts) // 1000) AS tsu_min,
           max(epoch_ns(ts) // 1000) AS tsu_max
         FROM events WHERE ts IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    // q133: tombstone membership ≡ the nibble predicate (the list IS
    // the users with nibble 0), so the oracle inlines it per row — an
    // independent formulation of the list-join the Spark plan runs
    "q133_compliance_purge" ->
      """SELECT event_type,
           count(CASE WHEN NOT p THEN 1 END) AS n_kept,
           count(CASE WHEN p THEN 1 END) AS n_purged,
           count(DISTINCT CASE WHEN p THEN user_id END) AS n_purged_users,
           round(coalesce(sum(CASE WHEN NOT p
               THEN CAST(value AS DECIMAL(18,6)) END), 0)::DOUBLE, 2)
             AS kept_value_sum
         FROM (SELECT *, strpos('0123456789abcdef',
             substr(md5(user_id::VARCHAR || ':purge'), 1, 1)) - 1 = 0 AS p
           FROM events)
         GROUP BY 1 ORDER BY 1""")
}
