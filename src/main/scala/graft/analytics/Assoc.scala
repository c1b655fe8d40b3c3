package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules (market-basket co-occurrence): for every
  * unordered item pair seen together in a basket, support, directional
  * confidence, and lift — the "users who view X also purchase Y"
  * screen over an event log, and the co-occurrence feature extractor
  * for a recommender.
  */
object Assoc {

  /** Rules over `(basketCol, itemCol)` pairs. Output: one row per
    * unordered co-occurring pair (`item_a < item_b`) with the basket
    * counts (`n_a`, `n_b`, `n_ab`, `n_baskets`) and the derived
    * `support`, `conf_a_to_b`, `conf_b_to_a`, `lift` — each one IEEE
    * division (lift one multiply each side) of exact integers, so the
    * doubles are engine/partitioning-stable.
    *
    * Shape: `distinct` first collapses the log to presence pairs (the
    * only pass over the full data), then the pair frame comes from a
    * basket-keyed self-join of that presence set — per-basket work is
    * (items-in-basket)², bounded by the item vocabulary, never by
    * basket event volume. Counts partial-agg map-side; the two item
    * marginals join back onto |pairs| rows. `minCount` prunes the rare
    * tail before the marginal joins.
    *
    * Overflow: `n_ab · n_baskets` and `n_a · n_b` must stay below 2^63
    * — at 1e9 baskets that allows any `n_ab ≤ 9e9`, fine for presence
    * counts.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    val nBaskets = items.agg(
      countDistinct(col("__b")).as("n_baskets"))
    val itemCounts = items.groupBy(col("__i"))
      .agg(count(lit(1)).as("__n_item"))
    val a = items.select(col("__b"), col("__i").as("item_a"))
    val b = items.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    pairs
      .join(itemCounts.select(col("__i").as("item_a"),
        col("__n_item").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"),
        col("__n_item").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"),
        col("n_a"), col("n_b"), col("n_ab"), col("n_baskets"),
        (col("n_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_to_a"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
