package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
  * "Connected Components in MapReduce and Beyond", SoCC 2014).
  *
  * Why a second components algorithm next to the min-label propagation
  * inside [[Dedup.duplicateClusters]]: propagation needs one round per unit
  * of component DIAMETER — a 10,000-node chain takes 10,000 rounds — while
  * star contraction collapses any component in O(log n) rounds regardless
  * of diameter, which is the property that matters when a 100 TB edge set
  * hides a long thin component (user sessions chained by shared devices,
  * near-dup chains, citation paths). Propagation stays the right tool for
  * the dedup pipeline where LSH components are provably shallow; this is
  * the general-graph tool.
  *
  * Both operations are one aggregate + one join on the node key:
  *
  *  - large-star(u): every neighbor v > u re-attaches to
  *    m = min(Γ(u) ∪ u) — long chains fold toward small ids;
  *  - small-star(u): u and every neighbor v < u attach to the minimum of
  *    that smaller neighborhood — stars flatten onto their root.
  *
  * Edges are carried canonically as (hi > lo); both operations preserve
  * that invariant by construction (each emitted edge attaches a node to
  * something strictly smaller), preserve the node set, and never grow the
  * per-round edge count past O(|E|). Convergence uses the same monotone
  * fixpoint trick as [[Dedup.duplicateClusters]]: each node's tentative
  * label min(Γ⁺(u)) is non-increasing round over round, so the decimal-
  * exact label SUM is strictly decreasing until the edge set is a star
  * forest — one aggregate per round instead of an edge-set equality join.
  *
  * Scale shape per round: two hash-shuffles on the node key (the min
  * aggregate and the distinct), one shuffle join — no global structure,
  * no driver-side graph state. Each generation is materialized and
  * lineage-cut through [[Checkpoints]] (reliable-checkpoint mode for real
  * clusters), and superseded generations are unpersisted, exactly like
  * the PageRank/k-means loops.
  */
object GraphOps {

  /** Per-node component labels for an undirected edge list.
    *
    * @param edges0 two numeric columns `a`, `b` (one row per edge;
    *               duplicates and self-loops tolerated)
    * @return (node: long, component: long) — component = min node id of
    *         the node's component; every endpoint of `edges0` appears.
    */
  def connectedComponents(
      edges0: DataFrame, maxIter: Int = 25,
      failOnNonConvergence: Boolean = false): DataFrame =
    ccWithRounds(edges0, maxIter, failOnNonConvergence)._1

  /** As [[connectedComponents]], also returning the number of
    * large-star+small-star rounds executed (spec hook: the O(log n)
    * convergence claim is asserted on engineered high-diameter graphs).
    */
  def ccWithRounds(
      edges0: DataFrame, maxIter: Int = 25,
      failOnNonConvergence: Boolean = false): (DataFrame, Int) = {
    val init = edges0
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
      .distinct()
    // Eager on purpose (round-21 A/B): a lazy cut here was measured
    // SLOWER on the CC family — cutLazy still finalizes the AQE stages at
    // construction, and deferring only the final stage made the first
    // consumer's multi-branch job race on computing it.
    var edges = Checkpoints.cut(init)

    def sym(e: DataFrame): DataFrame =
      e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))

    // Per-node neighborhood minimum — the ONE aggregate each round needs:
    // large-star joins against it, and the convergence check derives from
    // it (tentative label min(Γ⁺(u)) = least(mn, u), summed decimal-exact:
    // non-increasing per node, constant node set, so sum-unchanged <=>
    // edge set stable). Materialized (node-count-sized) because both
    // consumers would otherwise replay the symmetrize+aggregate shuffle —
    // fusing the old separate labelSum aggregate into this one cut saves
    // a full edge-sized shuffle per round.
    //
    // LAZY cut (round-20 job thinning): the labelSum aggregate that always
    // follows is a FULL pass (computes every partition — safe for lazy
    // localCheckpoint, unlike a limit-style action), so it materializes
    // the generation in the same job instead of paying a separate eager
    // materialization job per round.
    def neighborhoodMins(e: DataFrame): DataFrame =
      Checkpoints.cutLazy(sym(e).groupBy(col("u")).agg(min(col("v")).as("mn")))

    def labelSumOf(mins: DataFrame): java.math.BigDecimal =
      mins.agg(coalesce(
          sum(least(col("mn"), col("u")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")))
        .head().getDecimal(0)

    var mins = neighborhoodMins(edges)
    // Row count rides the FIRST label-sum aggregate (round-21 job
    // thinning): `mins` is empty iff the canonical edge set is — this
    // replaces the former separate `edges.isEmpty` driver action (a
    // limit-shaped job) with one more column in an aggregate that runs
    // anyway. An edgeless graph is already converged.
    val first = mins.agg(
      coalesce(sum(least(col("mn"), col("u")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("ls"),
      count(lit(1)).as("n")).head()
    var prev = first.getDecimal(0)
    var converged = first.getLong(1) == 0L
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // Large-star: v > u re-attaches to least(min Γ(u), u).
      // SHUFFLE_HASH on the node-sized mins (round-21, guide §3.1): the
      // LogicalRDD inputs carry no size stats, so the planner defaulted
      // to sort-merge — sorting the edge-sized side every round for a
      // build side bounded by nodes / shuffle.partitions at any scale.
      val nb = sym(edges)
      val ls = nb.join(mins.hint("SHUFFLE_HASH"), "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("mn"), col("u")).as("lo"))
        .distinct()
      // Small-star: canonical (hi, lo) rows ARE u's smaller neighborhood;
      // u and each v attach to that neighborhood's min.
      val le = ls.select(col("hi").as("u"), col("lo").as("v"))
      val mins2 = le.groupBy(col("u")).agg(min(col("v")).as("mn"))
      val ss = le.join(mins2.hint("SHUFFLE_HASH"), "u")
        .select(col("v").as("hi"), col("mn").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .union(mins2.select(col("u").as("hi"), col("mn").as("lo")))
        .distinct()
      // Lazy too: computing minsNext's shuffle runs every partition of ss,
      // so the single labelSum job below materializes BOTH generations.
      val next = Checkpoints.cutLazy(ss)
      val minsNext = neighborhoodMins(next)
      val cur = labelSumOf(minsNext)
      edges.unpersist(blocking = false)
      mins.unpersist(blocking = false)
      edges = next
      mins = minsNext
      converged = cur.compareTo(prev) == 0
      prev = cur
      rounds += 1
    }
    if (!converged) {
      val msg = s"connectedComponents did not converge within $maxIter rounds"
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    // Converged edge set is a star forest: min(Γ⁺) of the LAST generation's
    // materialized neighborhood mins is the component root.
    val labels = mins
      .select(col("u").as("node"), least(col("mn"), col("u")).as("component"))
    (labels, rounds)
  }

  /** Incremental connected components: fold an edge DELTA into a
    * previously computed labeling without replaying the full edge set —
    * the daily-delta maintenance path (at 100 TB nobody re-reads a year
    * of edges because today added 0.1%; the reference's own catalog build
    * is the same pattern, appending per-resource rows to an existing
    * catalog — `scripts/usgs_lidar.py:257-273`).
    *
    * A converged labeling IS a star forest: (node → component) edges of
    * depth 1. Union that forest with the delta and re-contract. The prior
    * graph's structure enters as stars — already fully collapsed — so
    * contraction only works on what the delta actually connects: rounds
    * are bounded by the merge depth the NEW edges induce over component
    * ids (≤ the full recompute's O(log n), typically 1-2 for a daily
    * delta), and the per-round edge count is |prior components' nodes| +
    * |delta|, not |historical edges|. Input sizes: the star forest is
    * node-count-sized (radically smaller than the historical edge set it
    * summarizes) and the delta is delta-sized.
    *
    * Equivalence: components(stars(G) ∪ D) = components(G ∪ D) on labels
    * restricted to G's nodes — two nodes of G are connected through
    * G-paths iff connected through their stars, and delta paths compose
    * identically. Nodes isolated in BOTH inputs (singleton components in
    * `prevLabels`) carry no edges, so they are re-attached as their own
    * component after the contraction.
    *
    * @param prevLabels (node, component) — a prior [[connectedComponents]]
    *                   output (or any equivalent labeling)
    * @param newEdges   two numeric columns `a`, `b`; duplicates,
    *                   self-loops, and nodes unseen before all tolerated
    * @return (node, component) over the UNION of prior nodes and delta
    *         endpoints; component = min node id, consistent with a full
    *         recompute over prior-edges ∪ delta.
    */
  def incrementalComponents(
      prevLabels: DataFrame, newEdges: DataFrame, maxIter: Int = 25,
      failOnNonConvergence: Boolean = false): DataFrame = {
    val stars = prevLabels
      .select(col("node").cast("long").as("a"), col("component").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val delta = newEdges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val labels = connectedComponents(stars.union(delta), maxIter, failOnNonConvergence)
    val nodes = prevLabels.select(col("node").cast("long").as("node"))
      .union(delta.select(col("a").as("node")))
      .union(delta.select(col("b").as("node")))
      .filter(col("node").isNotNull)
      .distinct()
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** Per-node triangle counts via the degree-ordered wedge join
    * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    * Reducer", WWW 2011).
    *
    * Each undirected edge is oriented from its lower-(degree, id) endpoint
    * toward the higher one; a triangle {x < y < z} in that total order is
    * then the unique wedge y←x→z whose closing edge y→z is also oriented —
    * so one self-join of the oriented edge list on the wedge center plus
    * one equi-join against the oriented edges counts every triangle exactly
    * once. The orientation is the whole scale story: a node's wedge fan-out
    * is C(out-degree, 2), and out-degrees under degree-ordering are bounded
    * by O(√|E|) even when raw degrees are power-law — the "last reducer"
    * (the celebrity node with 10⁸ neighbors generating 10¹⁶ wedges) cannot
    * occur. Every step is a key-hash aggregate or equi-join (degree compute
    * on the node key, wedge join on the center, closure join on the (a, b)
    * edge key); nothing is all-pairs and nothing lands on the driver.
    *
    * @param edges0 two numeric columns `a`, `b`, one row per undirected
    *               edge; duplicates and self-loops tolerated.
    * @return (node: long, deg: long, tri: long) — every endpoint with its
    *         deduplicated degree and the number of triangles through it.
    */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    val edges = edges0
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("s1"), greatest(col("a"), col("b")).as("s2"))
      .distinct()
    // NOT cut (round-20 note): the multiple consumers below collapse to
    // one physical pair build through AQE's ReusedExchange — the distinct's
    // exchange is shared — while a Checkpoints.cut here (tried, measured)
    // replaces parquet-statistics leaves with LogicalRDDs whose unknown
    // sizes forced every downstream join to sort-merge and cost ~0.6 s.
    // One pass over the pair build: the old two-branch union
    // (select(s1) ∪ select(s2)) re-ran the whole upstream pair chain per
    // branch — separate actions (the oriented cut below vs the serve
    // job) cannot share exchanges, so the recompute was real (profiled:
    // two ~1 s collect_set+explode stages per x58 run). explode emits
    // both endpoints map-side from a single scan.
    val deg = edges.select(explode(array(col("s1"), col("s2"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // Orient each edge from its lower-(degree, id) endpoint; s1 < s2 by
    // construction, so the degree tie resolves to s1 as the source.
    // Materialized once (Checkpoints.cut): three consumers (both wedge
    // sides and the closure probe) would otherwise each recompute the
    // whole pair-build + degree-join lineage.
    // (degree, id) total order: s1 < s2 by construction, so `<=` alone
    // resolves the degree tie toward s1 — lower id wins.
    val fwd = col("d1") <= col("d2")
    // Eager on purpose (round-21 A/B): a lazy cut here measured x58
    // ~23% SLOWER — the serve's three concurrent consumers raced on
    // computing the deferred final stage instead of reading blocks.
    val oriented = Checkpoints.cut(edges
      .join(deg.select(col("n").as("s1"), col("deg").as("d1")), "s1")
      .join(deg.select(col("n").as("s2"), col("deg").as("d2")), "s2")
      .select(
        when(fwd, col("s1")).otherwise(col("s2")).as("u"),
        when(fwd, col("s2")).otherwise(col("s1")).as("v"),
        when(fwd, col("d2")).otherwise(col("d1")).as("dv"))
      // Materialize at core width (round-20): the cut's blocks are what
      // the wedge self-join streams over, and AQE's bytes-coalesced
      // partitioning would serialize the C(out-degree, 2) wedge fan-out —
      // whose cost the bytes model cannot see — onto a handful of tasks.
      // Rows are three longs; max(cores, shuffle width) so the exchange
      // can never NARROW a deploy whose shuffle width exceeds its core
      // count (locally both are the core count — plan unchanged).
      .repartition(graft.util.Width.coresOrShuffleWidth(edges)))
    // Wedges v←u→w emitted once, endpoints ordered by (degree, id); the
    // triangle closes iff the oriented edge v→w exists.
    //
    // Wedges v←u→w emitted once, endpoints ordered by (degree, id); the
    // triangle closes iff the oriented edge v→w exists.
    val wedges = oriented.as("o1").join(
        oriented.as("o2"),
        col("o1.u") === col("o2.u") &&
          (col("o1.dv") < col("o2.dv") ||
            (col("o1.dv") === col("o2.dv") && col("o1.v") < col("o2.v"))))
      .select(col("o1.u").as("u"), col("o1.v").as("a"), col("o2.v").as("b"))
    val tri = wedges.join(
      oriented.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"))
    // One pass over the triangle instances: the previous 3-branch union
    // (tri.select(u) ∪ tri.select(a) ∪ tri.select(b)) re-ran the whole
    // wedge + closure join PER BRANCH (tri was never materialized and the
    // branches' exchanges hash different keys, so ReuseExchange could not
    // collapse them). explode over the endpoint array emits the same three
    // rows per triangle map-side, computing the joins exactly once.
    val perNode = tri
      .select(explode(array(col("u"), col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("n"), "left")
      .select(
        col("n").as("node"), col("deg").cast("long").as("deg"),
        coalesce(col("tri"), lit(0L)).cast("long").as("tri"))
  }
}
