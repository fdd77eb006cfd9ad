package graft.ops

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the co-occurrence graph — PageRank and
  * connected components via GraphX. The reference README claims these
  * (README.md:17, relation_graph/readme.md:18-19) but ships only the
  * co-occurrence counts (SURVEY.md §0.1); here the claim is made real,
  * clearly labeled as an extension.
  *
  * GraphX is RDD-based by design (Pregel iteration has no DataFrame
  * twin); the DataFrame boundary is kept tight: edges in, scored
  * DataFrame out, vertex ids are stable hashes of entity names.
  *
  * Storage discipline: the edge DataFrame is cached only while the
  * iteration runs; results are localCheckpoint-materialized (lineage
  * cut) so every upstream cache — ours and GraphX's internal ones — is
  * unpersisted before returning. Repeated invocations in a long-lived
  * session hold no storage.
  */
object GraphOps {

  val pageRankIters = 10
  val resetProb = 0.15

  private def edgeGraph(spark: SparkSession, dir: String): (Graph[Int, Long], DataFrame) = {
    // edgeCounts, not edges: the presentation sort is useless here and
    // would bake a global-sort exchange into the cached plan
    val e = CooccurrenceGraph.edgeCounts(spark, dir)
      .withColumn("src_id", xxhash64(col("src")))
      .withColumn("dst_id", xxhash64(col("dst")))
      .cache()
    // The AGGREGATED graph is bounded by the entity lexicon (|V| ≤
    // lexicon size, |E| ≤ |V|²) no matter how large the corpus — only
    // the edge-weight aggregation above scales with data volume. Running
    // Pregel's 20 iterations over 32 near-empty partitions is pure
    // scheduling overhead (measured 22 s → ~2 s at sf0.1), so the tiny
    // edge set is collapsed before iteration.
    val edges = e.select("src_id", "dst_id", "weight").rdd.map(r =>
      Edge(r.getLong(0), r.getLong(1), r.getLong(2))).coalesce(2)
    (Graph.fromEdges(edges, defaultValue = 0), e)
  }

  private def names(e: DataFrame): DataFrame =
    e.select(col("src").as("entity_id"), col("src_id").as("vid"))
      .union(e.select(col("dst"), col("dst_id")))
      .distinct()

  /** Materialize `out`, then drop every upstream cache: the caller gets
    * a lineage-free DataFrame whose blocks the ContextCleaner reclaims
    * on GC — no unbounded storage accumulation across invocations
    * (round-2 advice: edgeGraph cached and never unpersisted).
    */
  private def materializeAndRelease(out: DataFrame, e: DataFrame,
                                    graphs: Graph[_, _]*): DataFrame = {
    val done = out.localCheckpoint(true)
    graphs.foreach(_.unpersist(blocking = false))
    e.unpersist(blocking = false)
    done
  }

  /** WEIGHTED PageRank over the undirected (symmetrized) co-occurrence
    * graph: transition probability proportional to edge weight
    * (rank flows along heavy co-occurrence edges), the natural reading
    * of the reference readme's "relation strength" aspiration.
    * GraphX's staticPageRank is degree-normalized and ignores edge
    * attrs, so the power iteration is spelled out: normalize each edge
    * by its source's total out-weight, then iterate
    * rank = reset + (1-reset)·Σ incoming. Symmetrization leaves no
    * dangling vertices, so Σ rank = |V| is preserved exactly
    * (GraphOpsSpec pins it). Fixed iteration count → deterministic.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val (g0, e) = edgeGraph(spark, dir)
    val sym = Graph.fromEdges(
      g0.edges.union(g0.edges.map(ed => Edge(ed.dstId, ed.srcId, ed.attr))),
      defaultValue = 0).cache()
    val outWeight = sym.aggregateMessages[Double](
      t => t.sendToSrc(t.attr.toDouble), _ + _)
    val norm = sym.outerJoinVertices(outWeight)((_, _, w) => w.getOrElse(0.0))
      .mapTriplets(t => t.attr.toDouble / t.srcAttr)
    var ranks: Graph[Double, Double] = norm.mapVertices((_, _) => 1.0).cache()
    for (_ <- 1 to pageRankIters) {
      val msgs = ranks.aggregateMessages[Double](
        t => t.sendToDst(t.srcAttr * t.attr), _ + _)
      val prev = ranks
      ranks = ranks.outerJoinVertices(msgs)((_, _, m) =>
        resetProb + (1 - resetProb) * m.getOrElse(0.0)).cache()
      ranks.vertices.count() // materialize before dropping the parent
      prev.unpersist(blocking = false)
    }
    val s = spark
    import s.implicits._
    val rankDf = ranks.vertices.toDF("vid", "rank")
    val out = names(e).join(rankDf, "vid")
      .select(col("entity_id"), round(col("rank"), 6).as("pagerank"))
      .orderBy(desc("pagerank"), asc("entity_id"))
    materializeAndRelease(out, e, g0, sym, norm, ranks)
  }

  /** Connected components — entity clusters that ever co-occur. */
  def connectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val (g, e) = edgeGraph(spark, dir)
    val cc = g.connectedComponents()
    val s = spark
    import s.implicits._
    val ccDf = cc.vertices.toDF("vid", "component")
    val out = names(e).join(ccDf, "vid")
      .groupBy("component")
      .agg(sort_array(collect_list("entity_id")).as("members"),
        count(lit(1)).as("n_members"))
      .select(col("members")(0).as("component_rep"), col("members"), col("n_members"))
      .orderBy(desc("n_members"), asc("component_rep"))
    materializeAndRelease(out, e, g, cc)
  }

  val lpaIters = 10

  /** Deterministic WEIGHTED label propagation — community detection,
    * the second of the reference readme's graph aspirations
    * (relation_graph/readme.md:18-19; the reference implements neither).
    * Labels ARE entity names (not GraphX vertex ids), so the tie-break
    * is a total order a human can replay: each round, every vertex
    * adopts the label with the greatest incident edge-weight sum among
    * its neighbors' labels, ties to the LEXICOGRAPHICALLY SMALLEST
    * label. Synchronous rounds + ordered tie-break + fixed iteration
    * count = bit-deterministic output (plain LPA is notoriously
    * run-order-dependent; GraphOpsSpec pins a hand-computed fixture).
    *
    * `edges` = 3 columns (src, dst, weight), any names, one row per
    * undirected pair — the q95/q31 edge-table shape. Symmetrized here.
    * Scale: like q33/q34 the ITERATION runs on the lexicon-bounded
    * aggregated graph (|V| ≤ lexicon); only the upstream edge-weight
    * aggregation scales with corpus volume. Per-round caches are
    * dropped after materialization, result is lineage-cut.
    */
  def labelPropagation(edges: DataFrame, iters: Int = lpaIters): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst", "weight")
      .withColumn("src_id", xxhash64(col("src")))
      .withColumn("dst_id", xxhash64(col("dst")))
      .cache()
    val verts = names(e).rdd.map(r => (r.getLong(1), r.getString(0)))
    val sym = e.select("src_id", "dst_id", "weight").rdd.flatMap { r =>
      val (s, d, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
      Seq(Edge(s, d, w), Edge(d, s, w))
    }.coalesce(2)
    var g: Graph[String, Long] = Graph(verts, sym).cache()
    val toDrop = scala.collection.mutable.ArrayBuffer[Graph[_, _]](g)
    for (_ <- 1 to iters) {
      val msgs = g.aggregateMessages[Map[String, Long]](
        t => t.sendToDst(Map(t.srcAttr -> t.attr)),
        (a, b) => (a.keySet ++ b.keySet).iterator
          .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
      val prev = g
      g = g.outerJoinVertices(msgs)((_, old, m) =>
        m.filter(_.nonEmpty)
          .map(_.minBy { case (lbl, w) => (-w, lbl) }._1)
          .getOrElse(old)).cache()
      g.vertices.count() // materialize before dropping the parent
      prev.unpersist(blocking = false)
      toDrop += g
    }
    val s2 = spark
    import s2.implicits._
    val labelDf = g.vertices.toDF("vid", "label")
    val out = names(e).join(labelDf, "vid")
      .groupBy("label")
      .agg(sort_array(collect_list("entity_id")).as("members"),
        count(lit(1)).as("n_members"))
      // label-free output, like q34: rep = smallest member name
      .select(col("members")(0).as("community_rep"), col("members"),
        col("n_members"))
      .orderBy(desc("n_members"), asc("community_rep"))
    materializeAndRelease(out, e, toDrop.toSeq: _*)
  }

  /** Newman modularity of a partition, per community, in EXACT integer
    * arithmetic. With 2m = Σ degrees, T_c = Σ_{u∈c} k_u and
    * I_c = 2·Σ internal edge weight, the contribution of community c is
    * I_c/2m − (T_c/2m)² = (2m·I_c − T_c²) / (2m)² — numerator and
    * denominator are exact integers (decimal(38,0) here, HUGEINT in
    * the oracle twin — 64 bits would overflow the quadratic terms once
    * 2m passes ~3·10⁹, well inside corpus scale), so the only float op
    * is one final division of exact integers (deterministic in IEEE,
    * identically on both engines), unlike the usual floating
    * accumulation which is order-dependent. This is what makes a metric ON TOP OF an
    * iterative graph algorithm oracle-checkable at all (q74; the CC
    * partition is itself exactly SQL-reproducible).
    *
    * `edges`: one row per undirected pair (src, dst, weight);
    * `membership`: (entity_id, community). All shuffles are on entity
    * or community keys; the single-row 2m frame is broadcast.
    */
  def modularity(edges: DataFrame, membership: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst", "weight")
    val memb = membership.toDF("entity_id", "community")
    val deg = e.select(col("src").as("entity_id"), col("weight"))
      .unionAll(e.select(col("dst"), col("weight")))
      .groupBy("entity_id").agg(sum("weight").as("k"))
    val m2 = deg.agg(sum("k").as("m2")) // = 2m, one row
    // membership drives the rollup (left join): a zero-degree member —
    // legal in the generic contract, a vertex with no incident edge —
    // must still count in n_members and contribute k = 0, not vanish
    val tot = memb.join(deg, Seq("entity_id"), "left_outer")
      .na.fill(0L, Seq("k"))
      .groupBy("community")
      .agg(sum("k").as("t_c"), count(lit(1)).as("n_members"))
    val internal = e
      .join(memb.select(col("entity_id").as("src"), col("community").as("cs")), "src")
      .join(memb.select(col("entity_id").as("dst"), col("community").as("cd")), "dst")
      .filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("community"))
      .agg((sum("weight") * 2).as("i_c"))
    // the quadratic terms leave 64 bits long before the corpus does:
    // weights are corpus-scale co-occurrence counts, so at the design
    // point 2m can pass 3·10⁹ and m2², t_c², m2·i_c overflow Long
    // (ANSI throw, or an out-of-range oracle). decimal(38,0) carries
    // the products exactly to 2m ≈ 10¹⁹ (the oracle twin computes in
    // HUGEINT); the one float op stays a single division of exact
    // integers.
    // q_num is EMITTED as double (exact below 2^53, correctly-rounded
    // from the exact decimal beyond — and identically so in the oracle
    // twin): DECIMAL result columns are banned by the repo's oracle
    // type audit (DuckDB DECIMAL → pandas float64 re-hydration is the
    // round-5 hash-trap class, OracleTypeSpec)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    tot.join(internal, Seq("community"), "left_outer")
      .na.fill(0L, Seq("i_c"))
      .crossJoin(broadcast(m2))
      .withColumn("q_num",
        (col("m2").cast(d38) * col("i_c") - col("t_c").cast(d38) * col("t_c"))
          .cast("double"))
      .withColumn("q_contrib",
        round(col("q_num")
          / (col("m2").cast(d38) * col("m2")).cast("double"), 6))
      .select("community", "n_members", "t_c", "i_c", "m2", "q_num", "q_contrib")
      .orderBy("community")
  }

  /** q74 — modularity of the connected-component partition of the
    * co-occurrence graph (community id = min member name, matching
    * q34's label-free convention so the oracle can reproduce it).
    */
  def componentModularity(spark: SparkSession, dir: String): DataFrame = {
    val (g, e) = edgeGraph(spark, dir)
    val cc = g.connectedComponents()
    val s = spark
    import s.implicits._
    val memb0 = names(e).join(cc.vertices.toDF("vid", "comp0"), "vid")
    val rep = memb0.groupBy("comp0").agg(min("entity_id").as("community"))
    val memb = memb0.join(rep, "comp0").select("entity_id", "community")
    val out = modularity(e.select("src", "dst", "weight"), memb)
    materializeAndRelease(out, e, g, cc)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q33_pagerank" -> (pagerank(_, _)),
    "q74_component_modularity" -> (componentModularity(_, _)),
    // modularity OF the LPA communities (composition of the two graph
    // ops) over the real fanren relation graph; rows-only like q35 —
    // the partition is an iterative fixpoint, but the metric arithmetic
    // itself is oracle-proven by q74 and fixture-pinned in GraphOpsSpec.
    "q75_community_modularity" -> ((s, _) => {
      // `edges` feeds both LPA and the modularity joins, so the corpus
      // extraction runs twice (~2 s parallel wall each at 32 cores,
      // measured). Counter-intuitively, BOTH sharing attempts measured
      // 2-3x SLOWER end-to-end here (cache(): 20 s, eager
      // localCheckpoint: 14 s, vs 6-7 s warm as-is — TimeQuery, idle
      // host): materializing the aggregated table detaches the
      // downstream GraphX/join plans from the AQE-parallelized
      // extraction stage they otherwise fuse with. Re-measure before
      // "fixing" this again.
      val edges = Fidelity.edgesAgg(Fidelity.entityRows(
        s, Fidelity.fanRenGlob, graft.expr.RefLexicons.fanRen))
      val memb = labelPropagation(edges)
        .select(explode(col("members")).as("entity_id"),
          col("community_rep").as("community"))
      modularity(edges, memb)
    }),
    // communities over the reference's real relation graph (the q95
    // fanren edge table); members serialized for the driver like q34.
    // Rows-only: an iterative fixpoint has no SQL oracle — the label
    // dynamics are spec-pinned on a hand-computable fixture instead.
    "q35_label_propagation" -> ((s, _) =>
      labelPropagation(Fidelity.edgesAgg(
        Fidelity.entityRows(s, Fidelity.fanRenGlob, graft.expr.RefLexicons.fanRen)))
        .withColumn("members", array_join(col("members"), ","))),
    // members serialized for the driver (pandas can't hash numpy arrays,
    // CORRECTNESS_r02); library API keeps the native array<string>.
    "q34_connected_components" -> ((s, d) =>
      connectedComponents(s, d).withColumn("members", array_join(col("members"), ","))))

  /** q34 IS oracle-able despite GraphX: the output is label-free
    * (component_rep = min member, not a GraphX vertex id), so a DuckDB
    * recursive-CTE reachability closure over the same symmetrized edge
    * set reproduces it exactly — strings and integers only, no float
    * drift possible. q33's fixed-point doubles stay rows-only (the
    * power-iteration sums are order-dependent in IEEE; invariants
    * Σ rank = |V| and weight-monotone ranking pinned in GraphOpsSpec).
    */
  val oracles: Map[String, String] = Map(
    "q34_connected_components" ->
      (CooccurrenceGraph.entsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, e AS (
             SELECT a.w AS src, b.w AS dst
             FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.w < b.w
             GROUP BY 1, 2
           ), sym AS (
             SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e
           ), vs AS (SELECT DISTINCT a AS w FROM sym),
           reach AS (
             SELECT w AS a, w AS b FROM vs
             UNION
             SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
           ), comp AS (
             SELECT a AS w, min(b) AS rep FROM reach GROUP BY 1
           ), grp AS (
             SELECT rep, list_sort(list(w)) AS ms, count(*) AS n_members
             FROM comp GROUP BY 1
           )
           SELECT ms[1] AS component_rep, array_to_string(ms, ',') AS members,
             n_members
           FROM grp ORDER BY n_members DESC, component_rep"""),
    // q74: the same recursive reachability closure, weighted, feeding
    // the exact-integer modularity identity (2m·I_c − T_c²)/(2m)².
    // Every aggregate is ::BIGINT-cast (DuckDB sums BIGINT → HUGEINT);
    // the single float division of exact integers matches IEEE-exactly.
    "q74_component_modularity" ->
      (CooccurrenceGraph.entsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, we AS (
             SELECT a.w AS src, b.w AS dst, count(*)::BIGINT AS weight
             FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.w < b.w
             GROUP BY 1, 2
           ), sym AS (
             SELECT src AS a, dst AS b FROM we UNION SELECT dst, src FROM we
           ), vs AS (SELECT DISTINCT a AS w FROM sym),
           reach AS (
             SELECT w AS a, w AS b FROM vs
             UNION
             SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
           ), comp AS (
             SELECT a AS w, min(b) AS community FROM reach GROUP BY 1
           ), deg AS (
             SELECT w, sum(weight)::BIGINT AS k FROM (
               SELECT src AS w, weight FROM we
               UNION ALL SELECT dst, weight FROM we)
             GROUP BY 1
           ), m2t AS (SELECT sum(k)::BIGINT AS m2 FROM deg),
           tot AS (
             SELECT c.community, sum(d.k)::BIGINT AS t_c,
                    count(*)::BIGINT AS n_members
             FROM comp c JOIN deg d ON c.w = d.w GROUP BY 1
           ), intr AS (
             SELECT ca.community, (2 * sum(e.weight))::BIGINT AS i_c
             FROM we e
             JOIN comp ca ON e.src = ca.w
             JOIN comp cb ON e.dst = cb.w
             WHERE ca.community = cb.community GROUP BY 1
           )
           SELECT t.community, t.n_members, t.t_c,
             coalesce(i.i_c, 0)::BIGINT AS i_c, m.m2,
             (m.m2::HUGEINT * coalesce(i.i_c, 0)
               - t.t_c::HUGEINT * t.t_c)::DOUBLE AS q_num,
             round((m.m2::HUGEINT * coalesce(i.i_c, 0)
                 - t.t_c::HUGEINT * t.t_c)::DOUBLE
               / (m.m2::HUGEINT * m.m2)::DOUBLE, 6) AS q_contrib
           FROM tot t
           LEFT JOIN intr i ON t.community = i.community
           CROSS JOIN m2t m
           ORDER BY t.community"""))
}
