package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical forecast reconciliation (Hyndman et al. 2011; fpp3 §11) —
  * the missing piece between per-series forecasting and a REPORTING
  * hierarchy: base forecasts produced independently at each level of
  * customer → nation → total do NOT add up (each level's naive anchors
  * on a different last-observation day), and a planning system needs one
  * coherent number. The two classical closed-form reconciliations:
  *
  *   bottom-up:  ỹ(nation) = Σ_{customers ∈ nation} ŷ(customer)
  *   top-down:   ỹ(nation) = ŷ(total) · hist(nation)/hist(total)
  *               (historical-proportions split, fpp3 §11.3)
  *
  * Both are pure aggregations over the base-forecast table, so the whole
  * construction — base naive forecasts at all three levels plus both
  * reconciliations and the coherence gap — hash-checks against a DuckDB
  * replay. MinT/OLS trace minimization needs an error covariance and is
  * out of scope for a data engine's closed-form surface.
  *
  * Scale shape: ONE pass over the fact table builds the (customer, day)
  * cents aggregate (the only corpus-sized shuffle); every level above it
  * derives from that reduced table, and the dimension join is broadcast.
  * Money stays on the exact cents grid end to end; only the final
  * proportion division rounds (1e-6 grid). */
object Reconcile {

  /** Per-nation reconciled one-step forecasts over daily order totals.
    * Base model at every level: naive (last observed day's total — each
    * level anchors on ITS OWN last day, which is what makes the base
    * forecasts incoherent and the exercise real). Returns one row per
    * nation: the base forecast, both reconciled forecasts, and the
    * bottom-up coherence gap. */
  def naiveDaily(orders: DataFrame, customer: DataFrame,
                 nation: DataFrame): DataFrame = {
    // the one corpus-sized aggregate: (customer, day) → cents
    val daily = orders
      .select(col("o_custkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
              floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_custkey"), col("day"))
      .agg(sum(col("cents")).as("c2"))
      // customer SCALES with the fact table (unlike nation) — no forced
      // broadcast; the join keys the already-reduced (customer, day)
      // aggregate, so AQE picks broadcast at small SF and shuffle at scale
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
    // bottom level: per-customer naive = value at that customer's last day
    val custFc = daily.groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(max(struct(col("day"), col("c2"))).as("m"),
           sum(col("c2")).as("hist"))
      .select(col("c_nationkey"), col("m.c2").as("fc"), col("hist"))
    val bu = custFc.groupBy(col("c_nationkey"))
      .agg(sum(col("fc")).as("bu_cents"), sum(col("hist")).as("hist_cents"))
    // middle level: per-nation daily series, its own naive
    val natFc = daily.groupBy(col("c_nationkey"), col("day"))
      .agg(sum(col("c2")).as("c2"))
      .groupBy(col("c_nationkey"))
      .agg(max(struct(col("day"), col("c2"))).as("m"))
      .select(col("c_nationkey"), col("m.c2").as("base_cents"))
    // top level: the grand daily series' naive + grand history
    val top = daily.groupBy(col("day")).agg(sum(col("c2")).as("c2"))
      .agg(max(struct(col("day"), col("c2"))).as("m"))
      .select(col("m.c2").as("top_cents"))
    val topHist = daily.agg(sum(col("c2")).as("top_hist"))
    bu.join(natFc, Seq("c_nationkey"))
      .crossJoin(broadcast(top)).crossJoin(broadcast(topHist))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name"),
        (col("base_cents") / 100.0).as("yhat_base"),
        (col("bu_cents") / 100.0).as("yhat_bu"),
        // top-down: grand naive split by exact historical cents share
        (floor(col("top_cents") / 100.0
           * (col("hist_cents").cast("double") / col("top_hist"))
           * 1e6 + 0.5) / 1e6).as("yhat_td"),
        ((col("bu_cents") - col("base_cents")) / 100.0).as("gap_bu"))
  }
}
