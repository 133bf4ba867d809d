package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract meta-invariants: the correctness gate compares
  * `SparkEntry.queries` and `SparkEntry.oracleSql` BY NAME, so a key that
  * drifts between the two maps silently downgrades a hash-checked query to
  * rows-only (or orphans an oracle). Pinned here so registration mistakes
  * fail in CI, not in the driver's artifact.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("the rows-only set is exactly the three documented no-SQL-twin " +
      "ops (the approx trio graduated to banded-assertion oracles in " +
      "round 11)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("sim_ivf_topk", "multimodal_byte_features",
      "text_compression_ratio"),
      s"unexpected rows-only queries (add oracle SQL or document): $rowsOnly")
  }

  test("no duplicate names across query families (last-wins would shadow)") {
    val families = Seq(
      "parity" -> graft.queries.ParityQueries.queries.keySet,
      "quality" -> graft.queries.QualityQueries.queries.keySet,
      "relational" -> graft.queries.RelationalQueries.queries.keySet,
      "dedup" -> graft.queries.DedupQueries.queries.keySet,
      "similarity" -> graft.queries.SimilarityQueries.queries.keySet,
      "text" -> graft.queries.TextQueries.queries.keySet,
      "multimodal" -> graft.queries.MultimodalQueries.queries.keySet,
      "scale" -> graft.queries.ScaleQueries.queries.keySet,
      "prep" -> graft.queries.PrepQueries.queries.keySet,
      "feature" -> graft.queries.FeatureQueries.queries.keySet,
      "eval" -> graft.queries.EvalQueries.queries.keySet,
      "model" -> graft.queries.ModelQueries.queries.keySet)
    val dupes = families.flatMap { case (f, ks) => ks.map(_ -> f) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"query name registered by multiple families: " +
      dupes.map { case (k, v) => s"$k -> ${v.map(_._2)}" }.mkString(", "))
    assert(SparkEntry.queries.size == families.map(_._2.size).sum)
  }
}
