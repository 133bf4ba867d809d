package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * "A Theory for Record Linkage", JASA) — the cross-source sibling of
  * the dedup family: two views of the same entities with NOISY fields
  * and no shared key are matched by the log-likelihood ratio of their
  * field-agreement pattern. The reference's store upserts by exact
  * entity id (`ML Feature Store Pipeline.py:101-111`); linking a second
  * source that lacks that id is the step before any such upsert at
  * corpus scale.
  *
  * Model: for each comparison field k, `m_k = P(agree | match)` and
  * `u_k = P(agree | non-match)`. A candidate pair scores
  * `Σ_k log₂(m_k/u_k)` over agreeing fields plus
  * `Σ_k log₂((1−m_k)/(1−u_k))` over disagreeing ones; pairs above the
  * review threshold link. Estimation here is SUPERVISED — `m` from a
  * labeled true-pair sample (the classic clerical-review seed), `u`
  * from in-block non-match pairs (random pairs rarely match, the
  * standard u-estimator); the unsupervised EM variant fits the same
  * counts iteratively and plugs into the same weights.
  *
  * Determinism: agreement counts are exact integers; Laplace smoothing
  * `(c+1)/(n+2)` keeps every probability strictly inside (0,1); the
  * per-field weights round to 9 dp (the [[TokenModels]] bits9
  * discipline) and pair scores are exact DECIMAL sums of them.
  *
  * Shape at scale: candidate volume is Σ_b |A_b|·|B_b| over the blocking
  * key — never |A|·|B| — and both fitted weight relations are ONE row,
  * broadcast onto the candidates. The candidate relation materializes
  * once (localCheckpoint) so the u-estimation pass and the scoring pass
  * share it.
  */
object Linkage {

  private val W = DecimalType(18, 9)

  /** Link `a` to `b`: both carry `idCol` (ground-truth entity key, used
    * ONLY for m-estimation and the `is_match` audit bit), `blockCol`,
    * and the comparison `fields`. Returns pairs scoring ≥ `threshold`:
    * (a_id, b_id, n_agree, weight, is_match), one row per candidate pair
    * above threshold.
    */
  def fellegiSunter(a: DataFrame, b: DataFrame, idCol: String,
      blockCol: String, fields: Seq[String],
      threshold: Double = 0.0): DataFrame = {
    require(fields.nonEmpty, "linkage needs >= 1 comparison field")
    val aS = a.select(col(idCol).as("__aid") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__a_$f")): _*)
    val bS = b.select(col(idCol).as("__bid") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__b_$f")): _*)
    // m from the labeled true pairs (id join, NOT the blocks)
    val truePairs = aS.drop("__blk")
      .join(bS.drop("__blk"), col("__aid") === col("__bid"))
    val mAggs = count(lit(1)).as("__n") +: fields.map(f =>
      sum((col(s"__a_$f") <=> col(s"__b_$f")).cast("long")).as(s"__m_$f"))
    val mRow = truePairs.agg(mAggs.head, mAggs.tail: _*)
    // candidates once; u from their non-match majority
    val cand = aS.join(bS, Seq("__blk")).localCheckpoint()
    // coalesce: a degenerate block layout with ZERO non-match candidates
    // must yield u = smoothing-floor, not a NULL that swallows every score
    val uAggs = count(lit(1)).as("__nu") +: fields.map(f =>
      coalesce(sum((col(s"__a_$f") <=> col(s"__b_$f")).cast("long")),
        lit(0L)).as(s"__u_$f"))
    val uRow = cand.filter(col("__aid") =!= col("__bid"))
      .agg(uAggs.head, uAggs.tail: _*)
    // per-field 9-dp log₂ weights from Laplace-smoothed exact counts
    def lg2(x: Column): Column = round(log(x) / math.log(2.0), 9).cast(W)
    val weights = mRow.crossJoin(uRow).select(fields.flatMap { f =>
      val m = (col(s"__m_$f") + 1).cast(DoubleType) / (col("__n") + 2)
      val u = (col(s"__u_$f") + 1).cast(DoubleType) / (col("__nu") + 2)
      Seq(lg2(m / u).as(s"__wa_$f"), lg2((lit(1.0) - m) / (lit(1.0) - u))
        .as(s"__wd_$f"))
    }: _*)
    val agree = (f: String) => col(s"__a_$f") <=> col(s"__b_$f")
    val score = fields.map(f =>
      when(agree(f), col(s"__wa_$f")).otherwise(col(s"__wd_$f")))
      .reduce(_ + _).cast(DecimalType(28, 9))
    val nAgree = fields.map(f => agree(f).cast("int")).reduce(_ + _)
    cand.crossJoin(broadcast(weights))
      .select(col("__aid").as("a_id"), col("__bid").as("b_id"),
        nAgree.as("n_agree"), round(score.cast(DoubleType), 9).as("weight"),
        (col("__aid") === col("__bid")).as("is_match"))
      .filter(col("weight") >= threshold)
  }
}
