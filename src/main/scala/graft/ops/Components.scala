package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list,
  * shared by the text near-dup clustering (MinHash-LSH candidate
  * edges, `dedup_clusters`) and the embedding semantic-dedup
  * clustering (cosine-LSH near-dup edges, `embed_dedup_clusters*`).
  *
  * Algorithm: per round, (1) min-label propagation — every node takes
  * the minimum label over itself and its neighbors — followed by
  * (2) pointer doubling — every node re-reads the label OF its new
  * label in the same round (labels are always member node ids, so the
  * lookup is a self-join of the label table). Step 1 alone converges
  * in O(diameter) rounds, which is O(n) on chain-shaped dup graphs
  * (templated pages A~B~C~... at a permissive threshold — exactly what
  * a web corpus produces). Step 2 makes the reach roughly double per
  * round, so convergence is O(log n) rounds on any shape — the same
  * bound as large-star/small-star (Kiveris et al., SOCC'14;
  * hash-to-min of Rastogi et al., ICDE'13) with a simpler per-round
  * plan. Measured on a 10,000-node path graph (the adversarial
  * diameter case, ComponentsSpec): 13 rounds vs 9,999 for pure
  * propagation; the spec pins rounds <= 2*ceil(log2 n).
  *
  * Scale shape: per round, TWO shuffle joins (edge x label, then
  * label x label) plus one min-aggregation, each cut from the plan
  * lineage by a localCheckpoint — O(log n) * O(|V|+|E|) total traffic
  * vs O(diameter) * O(|V|+|E|) for propagation alone. The convergence
  * signal is carried THROUGH each round's checkpoint (`changed` is
  * computed in the same pass that builds the new labels), so each
  * round is one eager checkpoint job plus an isEmpty scan of the
  * cached blocks that short-circuits on the first changed row. */
object Components {

  /** Cluster an undirected pair list. `aCol`/`bCol` name the pair
    * columns of `pairs`; the output id column is named `idName`.
    * Output: (idName, cluster_id, cluster_size, is_survivor) where
    * cluster_id = min member id and the survivor is that minimum —
    * the same election both DuckDB recursive-CTE oracles compute. */
  def clusterPairs(pairs: DataFrame, aCol: String, bCol: String,
      idName: String): DataFrame =
    clusterPairsCounted(pairs, aCol, bCol, idName)._1

  /** As `clusterPairs`, also returning the number of label-update
    * rounds the loop ran before converging (asserted O(log n) by
    * ComponentsSpec on a path graph — the worst case for propagation). */
  def clusterPairsCounted(pairs: DataFrame, aCol: String, bCol: String,
      idName: String): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true) // reused every round: cut the candidate subtree once
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("label").as("src_label")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_label"))
      // Step 1: min over self + neighborhood. `old_label` rides along so
      // the post-doubling change test needs no third join.
      val half = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // Step 2: pointer doubling — label := label(label). Every label
      // value is a member node id, so the hop table covers it; the left
      // join + coalesce only guards degenerate inputs.
      val next = half
        .join(half.select(col("label").as("hop"), col("id").as("label")), Seq("label"), "left")
        .select(col("id"),
          coalesce(col("hop"), col("label")).as("label"),
          (coalesce(col("hop"), col("label")) < col("old_label")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("label"))
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    val out = labels.join(sizes, "label")
      .select(col("id").as(idName), col("label").as("cluster_id"),
        col("cluster_size"), (col("id") === col("label")).as("is_survivor"))
    (out, rounds)
  }
}
