package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative min-label propagation (connected components), shared by
  * the text near-dup clustering (MinHash-LSH candidate edges,
  * `dedup_clusters`) and the embedding semantic-dedup clustering
  * (cosine-LSH near-dup edges, `embed_dedup_clusters`).
  *
  * Scale shape: per round, one shuffle join of the label table against
  * the checkpointed edge list plus one min-aggregation — rounds =
  * component diameter, which stays tiny for dup cliques. The
  * convergence signal is carried THROUGH each round's localCheckpoint
  * (`changed` is computed in the same pass that builds the new
  * labels), so each round is one eager checkpoint job plus an isEmpty
  * scan of the cached blocks that short-circuits on the first changed
  * row — not the two extra full-shuffle driver probes the earlier
  * per-round re-join paid. */
object Components {

  /** Cluster an undirected pair list. `aCol`/`bCol` name the pair
    * columns of `pairs`; the output id column is named `idName`.
    * Output: (idName, cluster_id, cluster_size, is_survivor) where
    * cluster_id = min member id and the survivor is that minimum —
    * the same election both DuckDB recursive-CTE oracles compute. */
  def clusterPairs(pairs: DataFrame, aCol: String, bCol: String,
      idName: String): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true) // reused every round: cut the candidate subtree once
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    while (!converged) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("label").as("src_label")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("id"), col("label"))
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as(idName), col("label").as("cluster_id"),
        col("cluster_size"), (col("id") === col("label")).as("is_survivor"))
  }
}
