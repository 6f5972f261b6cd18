package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over edge tables — the graph-shaped
  * complement to [[Dedup.components]]' connectivity fixpoint.
  *
  * 100-TB shape: edges are the only large table; every iteration is one
  * hash join edges⋈ranks on the source key followed by one reduce on
  * the destination key — the standard Pregel message pattern expressed
  * declaratively, so AQE/bucketing can co-partition both sides and the
  * edge table never re-shuffles once partitioned by `src`. */
object Graph {

  /** Fixed-iteration PageRank (Page et al. 1999) with EXACT integer
    * arithmetic, so the trajectory is bit-identical in any engine and
    * under any reduction order: ranks live on a 1e12 fixed-point grid,
    * each out-contribution is the integer division `pr div outdeg`, the
    * damped update is
    *   pr'(v) = floor(0.15·scale) + floor(0.85 · Σ_in contrib)
    * with floor(0.85·s) computed overflow-safely as
    * `85·(s div 100) + (85·(s mod 100)) div 100` (exact because
    * 85s/100 = 85q + 85r/100 for s = 100q + r). Per-node in-mass stays
    * below |V|·scale, so BIGINT sums are exact for |V| < ~9·10^6 at the
    * default grid; pass a smaller `scale` for larger graphs.
    *
    * `edges` is directed (src, dst); callers model an undirected graph
    * by supplying both directions. Nodes are everything with at least
    * one OUT-edge (with bidirectional edges: every endpoint); a node
    * with no in-edges holds the base rank. A FIXED iteration count
    * (not a convergence test) keeps the operator deterministic and the
    * oracle replayable as `iters` unrolled joins.
    *
    * Scale shape: `edges` and the degree table are persisted once and
    * reused every round; the final ranks are eagerly materialized
    * (localCheckpoint — see [[Dedup.componentsStats]] for the durable
    * variant rationale, not needed here because the lineage is bounded
    * at `iters` joins) so the inputs can be unpersisted before return. */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int = 5,
                    scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(scale % 100L == 0 && scale > 0, s"need scale > 0 divisible by 100, got $scale")
    // e is persisted HASH-PARTITIONED on src, and deg (a groupBy on the
    // same key) inherits that partitioning: every per-round pr⋈deg⋈e
    // chain then satisfies its clustered distribution from the cache —
    // only the small rank table and the per-round dst reduce move.
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst"))
      .repartition(col("src")).persist()
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("d")).persist()
    val base = 15L * (scale / 100L)
    // the rank table CARRIES its out-degree so each sweep is one
    // pr⋈e join + one dst reduce + one deg⋈sums rebuild — the former
    // per-iteration pr⋈deg join (iters extra exchanges/broadcasts of the
    // full |V|-row rank table) is folded into the rebuild that had to
    // read deg anyway. Same integer trajectory, bit-identical ranks.
    var pr = deg.select(col("id"), col("d"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val sums = pr
        .withColumn("c", expr("pr div d"))
        .join(e, col("id") === col("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("s"))
      pr = deg
        .join(sums, Seq("id"), "left")
        .withColumn("s", coalesce(col("s"), lit(0L)))
        .select(col("id"), col("d"),
          (lit(base) + expr("85 * (s div 100) + (85 * (s % 100)) div 100"))
            .as("pr"))
    }
    val out = pr.select(col("id"), col("pr")).localCheckpoint(true)
    e.unpersist(); deg.unpersist()
    out
  }

  /** Adamic–Adar link prediction over a bipartite incidence table
    * (Adamic & Adar 2003, "Friends and neighbors on the Web"): for
    * pairs of left-nodes sharing at least one right-node,
    *   AA(a, b) = Σ_{z ∈ Γ(a) ∩ Γ(b)} 1/ln(deg z)
    * — common neighbors weighted down by their popularity, the classic
    * "who else sources from the same rare supplier" signal. Emits the
    * `topK` pairs (a < b) by score with the common-neighbor count.
    *
    * Skew contract: right-nodes with degree > `maxDeg` are EXCLUDED
    * from pair generation (the d2/d13 maxDf discipline — a hub shared
    * by everyone both blows up the self-join quadratically and carries
    * ~zero AA weight 1/ln(huge); the cap loses only negligible score
    * mass and is the documented 100-TB guard). Each right-node
    * contributes C(deg, 2) ≤ C(maxDeg, 2) pairs — hit-linear, never
    * all-pairs. Determinism: per-neighbor terms fold as
    * floor(1e9/ln(deg)) BIGINTs; deg >= 2 guarantees ln > 0. */
  def adamicAdar(incidence: DataFrame, leftCol: String, rightCol: String,
                 topK: Int = 50, maxDeg: Int = 10): DataFrame = {
    require(topK >= 1 && maxDeg >= 2, s"need topK >= 1, maxDeg >= 2; got ($topK, $maxDeg)")
    import org.apache.spark.sql.expressions.Window
    val inc = incidence.select(col(leftCol).cast("long").as("a"),
      col(rightCol).cast("long").as("z")).distinct()
    val wz = Window.partitionBy(col("z"))
    val kept = inc
      .withColumn("deg", count(lit(1)).over(wz).cast("long"))
      .filter(col("deg").between(2L, maxDeg.toLong))
      .withColumn("term9",
        floor(lit(1e9) / log(col("deg").cast("double")) + lit(0.5)).cast("long"))
    val pairs = kept.select(col("z"), col("a"), col("term9"))
      .join(kept.select(col("z"), col("a").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
    // Top-k selection is orderBy+limit — Spark plans TakeOrderedAndProject
    // (per-partition partial top-k, k rows shipped per task), NEVER a
    // single-partition row_number window over the full hit-linear pair
    // table. Ranks are then positions in ONE sorted ≤topK-element array:
    // window-free, bounded, exact (score9 is an exact BIGINT; ties break
    // on (a, b), the struct sort order).
    val top = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_common"),
           sum(col("term9")).as("score9"))
      .orderBy(col("score9").desc, col("a"), col("b"))
      .limit(topK)
    top
      .agg(sort_array(collect_list(struct(
        (-col("score9")).as("ns"), col("a"), col("b"), col("n_common")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("i", "r")))
      .select(col("r.a").as("a"), col("r.b").as("b"),
        col("r.n_common").as("n_common"),
        ((-col("r.ns")) / 1e9).as("aa_score"),
        (col("i") + 1).cast("long").as("rk"))
  }

  /** Bounded k-core peeling (Seidman 1983's coreness, the first
    * `rounds` sweeps of the standard peel): each round drops every
    * node whose CURRENT degree is below `k` and restricts the edge set
    * to surviving endpoints; the fixpoint is the k-core, and the
    * per-round (n_nodes, n_edges) trajectory is the densification
    * observable (how fast the periphery burns off). A FIXED round
    * budget keeps the operator deterministic and the oracle replayable
    * as unrolled CTEs — pass more rounds to approach the fixpoint
    * (each round only shrinks the sets, so the trajectory is monotone
    * and equal rounds ⇒ equal results in any engine).
    *
    * Emits one row per round: (round, n_nodes, n_edges) — n_nodes =
    * survivors entering the round's restriction, n_edges = directed
    * edges among them. Scale shape: per round ONE degree reduce + two
    * semi-joins (the Pregel shape again); counts are two scalar
    * aggregates. Callers supply both directions for undirected graphs
    * (then out-degree = degree). */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int = 5): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got ($k, $rounds)")
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    e.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to rounds) {
      // survivors are persisted: the degree agg would otherwise run
      // three times (both semi-joins + the count)
      val keep = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).cast("long").as("d"))
        .filter(col("d") >= k.toLong)
        .select(col("id")).persist()
      val nNodes = keep.count()
      val next = e
        .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")).persist()
      val nEdges = next.count()
      out += ((r.toLong, nNodes, nEdges))
      keep.unpersist(); e.unpersist()
      e = next
    }
    e.unpersist()
    out.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** Degree assortativity (Newman 2002, "Assortative mixing in
    * networks"): the Pearson correlation of (out-degree(src),
    * out-degree(dst)) over every directed edge — positive when hubs
    * attach to hubs, negative for hub-and-spoke topologies; the one
    * scalar that says which skew regime a graph's joins will face.
    * Emits one row (n_edges, mean_src_deg, mean_dst_deg, r).
    *
    * Determinism: degrees are exact integers, the five Pearson moments
    * fold as exact BIGINTs (contract: deg²·|E| < 2^63 — fine for
    * degrees into the tens of thousands at billions of edges), r is a
    * fixed-op-order double. Shape: one degree reduce + two joins of the
    * |V|-row degree table onto the edges (broadcast-hinted — past the
    * broadcast ceiling Spark falls back to shuffled hash joins on the
    * same plan) + one map-side-combined moment reduce. Degenerate
    * graphs (all degrees equal on either side) emit null, not 0/0. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
                         col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("d"))
    e.join(broadcast(deg.withColumnRenamed("d", "dx")),
        col("src") === col("id")).drop("id")
      .join(broadcast(deg.withColumnRenamed("d", "dy")),
        col("dst") === col("id")).drop("id")
      .agg(count(lit(1)).cast("long").as("n_edges"),
           sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
           sum(col("dx") * col("dy")).as("sxy"),
           sum(col("dx") * col("dx")).as("sxx"),
           sum(col("dy") * col("dy")).as("syy"))
      .withColumn("mean_src_deg", col("sx").cast("double") / col("n_edges"))
      .withColumn("mean_dst_deg", col("sy").cast("double") / col("n_edges"))
      .withColumn("covn",
        col("sxy").cast("double")
          - col("sx").cast("double") * col("sy") / col("n_edges"))
      .withColumn("vxn",
        col("sxx").cast("double")
          - col("sx").cast("double") * col("sx") / col("n_edges"))
      .withColumn("vyn",
        col("syy").cast("double")
          - col("sy").cast("double") * col("sy") / col("n_edges"))
      .withColumn("r",
        when(col("vxn") > 0.0 && col("vyn") > 0.0,
          col("covn") / sqrt(col("vxn") * col("vyn"))))
      .select(col("n_edges"), col("mean_src_deg"), col("mean_dst_deg"),
              col("r"))
  }
  /** Degree-capped triangle census + global clustering coefficient
    * (Watts & Strogatz 1998; Newman 2003 "The structure and function of
    * complex networks" eq. 3): over the undirected simple graph given as
    * canonical a < b edge rows,
    *   gcc = 3·triangles / wedges,  wedges = Σ_v C(deg v, 2).
    * Emits one row (n_nodes, n_edges, n_wedges, n_triangles, gcc).
    *
    * Skew contract (the adamicAdar maxDeg discipline): nodes with degree
    * > `maxDeg` are EXCLUDED before the census — a hub makes the wedge
    * join quadratic in its degree while telling you nothing local; the
    * cap bounds per-key fan-out at C(maxDeg, 2), so the triangle join is
    * hit-linear, never all-pairs. Determinism: every output is an exact
    * integer count (gcc the one ratio) — identical under any
    * partitioning. Shape: one degree reduce, two semi-joins to apply the
    * cap, one hash join on the shared endpoint (a<b<c canonical order
    * counts each triangle exactly once), one semi-join to close it. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
                    maxDeg: Int = 30,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(maxDeg >= 2, s"need maxDeg >= 2, got $maxDeg")
    // The edge list may be an EXPENSIVE subplan (g5 feeds the full d2
    // near-dup join in here) and it is consumed by the degree reduce, the
    // cap, the wedge join (3×) and the edge count — without
    // materialization the upstream recomputes per consumer (measured: 60
    // corpus scans in g5's physical plan). Canonical edges are 16 B/row:
    // checkpoint them once, and the capped set again (5 consumers).
    val e0 = Lineage.truncate(edges.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .filter(col("a") < col("b")).distinct(), checkpointDir)
    val deg0 = e0.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val kept = deg0.filter(col("d") <= maxDeg.toLong).select(col("id"))
    val e = Lineage.truncate(e0
      .join(kept.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(kept.withColumnRenamed("id", "b"), Seq("b"), "left_semi"),
      checkpointDir)
    // degrees and wedges are recomputed on the CAPPED edge set — the
    // census describes the graph it actually ran on
    val degc = e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val sizes = degc.agg(
      count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("d*(d-1) div 2")), lit(0L)).as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val tri = e
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    sizes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .withColumn("gcc",
        when(col("n_wedges") > 0L,
          lit(3.0) * col("n_triangles") / col("n_wedges").cast("double")))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
              col("n_triangles"), col("gcc"))
  }
}
