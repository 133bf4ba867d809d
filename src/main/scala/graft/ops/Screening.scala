package graft.ops

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Feature-screening statistics — the cheap pre-training filters that
  * decide which candidate features/labels are worth a model's attention:
  * χ² and mutual information over a contingency table, the two-sample
  * Kolmogorov–Smirnov distance, and Cohen's κ label agreement.
  *
  * Scale shape: every statistic reduces the data to ONE tiny relation in a
  * single shuffle (a contingency table, a distinct-value CDF grid, a
  * confusion matrix); marginals and totals come from windows/aggregates
  * over THAT relation, never a second data pass.
  *
  * Determinism discipline (the [[graft.functions.Exact]] argument): counts
  * stay integers as long as possible — thresholds and κ reduce to integer
  * cross-products with ONE final IEEE division; χ²/MI contributions are a
  * fixed IEEE op sequence rounded to 9 dp and summed in exact DECIMAL, so
  * results are bit-identical on any engine at any partitioning.
  */
object Screening {

  private val Exact9 = DecimalType(28, 9)

  /** χ² statistic and mutual information (nats) between two categorical
    * columns. One (a, b) group-by builds the R×C contingency table;
    * marginals are windows over it. Returns one row:
    * (n, dof, chi2, mi_nats).
    *
    * χ² sums OBSERVED cells — exact when every (a,b) combination
    * occurs (the quartile-bucket / screening tables this feeds), but an
    * understatement on sparse tables, where each structural zero should
    * still contribute its expectation. For association over sparse
    * tables use [[associationStrength]], whose χ² covers the full table
    * through the Σ o²/e − n identity.
    */
  def contingencyStats(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cont = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val all = Window.partitionBy()
    val withM = cont
      .withColumn("ra", sum("o").over(Window.partitionBy("a")))
      .withColumn("cb", sum("o").over(Window.partitionBy("b")))
      .withColumn("n", sum("o").over(all))
      .withColumn("n_a", size(collect_set("a").over(all)))
      .withColumn("n_b", size(collect_set("b").over(all)))
    // e = ra·cb/n: the integer product is exact (≤ n², fits a long), the
    // division is the single IEEE op — mirrored verbatim in the oracle
    val e = (col("ra") * col("cb")).cast(DoubleType) / col("n")
    val chi2C = round((col("o") - e) * (col("o") - e) / e, 9).cast(Exact9)
    val miC = round(
      col("o").cast(DoubleType) / col("n") *
        log((col("o") * col("n")).cast(DoubleType) / (col("ra") * col("cb"))),
      9).cast(Exact9)
    withM
      .groupBy(col("n"),
        ((col("n_a") - 1) * (col("n_b") - 1)).cast("long").as("dof"))
      .agg(sum(chi2C).cast(DoubleType).as("chi2"),
        sum(miC).cast(DoubleType).as("mi_nats"))
      .select("n", "dof", "chi2", "mi_nats")
  }

  /** Normalized association strength between two categorical columns —
    * Cramér's V (Cramér 1946) and Theil's uncertainty coefficient
    * U(A|B): the [0,1] readouts a corpus-mixture audit actually
    * compares across column pairs, where raw χ²/MI grow with n and
    * table size. V = √(χ²/(n·(min(r,c)−1))) is symmetric; Theil's U =
    * MI/H(A) is DIRECTED — "how much of A does knowing B remove" — so
    * U(lang|source) ≠ U(source|lang), which is exactly the
    * slice-leakage question.
    *
    * χ² here covers the FULL R×C table, zero cells included — the
    * perfect-association case is exactly the one dense with structural
    * zeros — via the identity χ² = Σ_observed o²/e − n (each unobserved
    * cell contributes its e, and Σ_all e = n), so only observed cells
    * are ever materialized. Per-cell o²·n/(ra·cb) is RATIONAL, so it is
    * quantized by truncating nano-unit INTEGER division (never a 9-dp
    * round of a rational — engines disagree on half-ulp ties) and
    * summed exactly; MI's zero cells contribute 0 in the limit, so
    * observed-only is already exact there, and its ln keeps the 9-dp
    * round safe. V rounds 9 dp riding its
    * sqrt (irrational); U is emitted UNROUNDED — a ratio of two exact
    * decimals is rational, and every step is one correctly-rounded IEEE
    * op on identical inputs (the Welch-dof argument). V null when
    * min(r,c) = 1; U null when H(A) = 0 (single A category).
    *
    * Scale shape: one (a,b) group-by collapses the data to the R×C
    * contingency table; marginals/entropies are windows and aggregates
    * over THAT (category²-bounded) relation — never a second data pass.
    * Returns one row: (n, r, c, chi2, mi_nats, h_a, cramers_v,
    * theils_u).
    */
  def associationStrength(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cont = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val all = Window.partitionBy()
    val withM = cont
      .withColumn("ra", sum("o").over(Window.partitionBy("a")))
      .withColumn("cb", sum("o").over(Window.partitionBy("b")))
      .withColumn("n", sum("o").over(all))
      .withColumn("n_a", size(collect_set("a").over(all)))
      .withColumn("n_b", size(collect_set("b").over(all)))
    val big = DecimalType(38, 0)
    // full-table χ² from observed cells only: Σ o²·n/(ra·cb) − n. Each
    // contribution is RATIONAL, so a 9-dp round() can land on a
    // half-ulp tie where engines disagree (measured here) — instead
    // quantize by TRUNCATING nano-unit integer division (div / //
    // agree bit-exactly on positives). Headroom: o²·n·10⁹ must fit
    // DECIMAL(38,0) and each cell's nano value a long — holds to
    // ~10⁸-row tables; beyond that, drop to micro-units (the identity
    // is unchanged).
    val chi2Nano = expr("(cast(o as decimal(38,0)) * o * n * 1000000000)" +
      " div (cast(ra as decimal(38,0)) * cb)")
    val miC = round(
      col("o").cast(DoubleType) / col("n") *
        log((col("o") * col("n")).cast(DoubleType) / (col("ra") * col("cb"))),
      9).cast(Exact9)
    val stats = withM
      .groupBy(col("n"), col("n_a").cast("long").as("r"),
        col("n_b").cast("long").as("c"))
      .agg(((sum(chi2Nano.cast(big)) -
          col("n").cast(big) * lit(1000000000L).cast(big))
          .cast(DoubleType) / lit(1.0e9)).as("chi2"),
        sum(miC).cast(DoubleType).as("mi_nats"))
    val haC = round(-(col("ra").cast(DoubleType) / col("n")) *
      log(col("ra").cast(DoubleType) / col("n")), 9).cast(Exact9)
    val ha = withM.select(col("a"), col("ra"), col("n")).distinct()
      .agg(coalesce(sum(haC).cast(DoubleType), lit(0.0)).as("h_a"))
    val minRc = least(col("r"), col("c"))
    stats.crossJoin(broadcast(ha))
      .withColumn("cramers_v", when(minRc > 1,
        round(sqrt(greatest(col("chi2"), lit(0.0)) /
          (col("n") * (minRc - 1))), 9)))
      .withColumn("theils_u",
        when(col("h_a") > 0, col("mi_nats") / col("h_a")))
      .select("n", "r", "c", "chi2", "mi_nats", "h_a", "cramers_v",
        "theils_u")
  }

  /** Two-sample Kolmogorov–Smirnov distance between `valueCol`
    * distributions of groups `a` and `b` of `groupCol`:
    * D = max over the pooled support of |F_a − F_b|.
    *
    * The data collapses to per-distinct-value counts in one shuffle; the
    * CDF walk runs through the two-phase salted grid machinery
    * ([[SaltedGrid.cumulative]]), so a continuous-valued (row-scale) grid
    * fans out over buckets instead of one task. D stays an integer
    * cross-multiply
    * max |cumA·nB − cumB·nA| until the single final division.
    * Returns one row: (n_a, n_b, d_num, d).
    */
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val xd = col(valueCol).cast(DecimalType(18, 2))
    val perV = df.filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(xd.as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
      .groupBy("v").agg(sum("ia").as("ca"), sum("ib").as("cb"))
    // two-phase salted CDF walk ([[SaltedGrid]]): a continuous column
    // makes the pooled grid row-scale — never one window task
    SaltedGrid.cumulative(perV, "v", Seq("ca", "cb"))
      .select(col("__tot_ca").as("na"), col("__tot_cb").as("nb"),
        abs(col("__cum_ca") * col("__tot_cb") -
          col("__cum_cb") * col("__tot_ca")).as("dn"))
      .groupBy("na", "nb").agg(max("dn").as("d_num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
        round(col("d_num").cast(DoubleType) / (col("na") * col("nb")), 9)
          .as("d"))
  }

  /** Cohen's κ agreement between two label columns over the same rows.
    * κ = (p_o − p_e)/(1 − p_e) rewritten as the all-integer
    * (agree·n − Σ_c ra_c·cb_c) / (n² − Σ_c ra_c·cb_c) — ONE IEEE division
    * total, so the statistic is engine-exact. Returns one row:
    * (n, agree, pe_num, kappa).
    */
  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) — the re-identification governance check a training-data
    * release runs before shipping rows that carry quasi-identifiers:
    * every equivalence class of the quasi-identifier combination gets
    * its size (k-anonymity: a class smaller than `k` makes its members
    * linkable), its count of distinct sensitive values (l-diversity: a
    * class with fewer than `l` sensitive values leaks the attribute even
    * when k holds), and violation flags. The per-row "prosecutor" risk
    * 1/class_size is exact integer arithmetic downstream
    * (Σ_rows 1/size = n_classes/N).
    *
    * Shape at scale: ONE group-by on the quasi columns — size is
    * map-side combined; the distinct-sensitive count shuffles (class,
    * sensitive) pairs bounded by the class × value domain; a hot class
    * is one combiner cell, never a window. Returns one row per class:
    * (quasiCols…, class_size, l_diversity, violates_k, violates_l).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"bad thresholds k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("violates_k", col("class_size") < k)
      .withColumn("violates_l", col("l_diversity") < l)
  }

  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val counts = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val ra = base.groupBy(col("a").as("c")).agg(count(lit(1)).as("ra"))
    val cb = base.groupBy(col("b").as("c")).agg(count(lit(1)).as("cb"))
    val peNum = ra.join(cb, Seq("c"), "full_outer")
      .agg(sum(coalesce(col("ra"), lit(0L)) * coalesce(col("cb"), lit(0L)))
        .as("pe_num"))
    counts.crossJoin(broadcast(peNum))
      .select(col("n"), col("agree"), col("pe_num"),
        round((col("agree") * col("n") - col("pe_num")).cast(DoubleType)
          / (col("n") * col("n") - col("pe_num")), 9).as("kappa"))
  }

  /** McNemar's test for two classifiers scored on the SAME rows — the
    * paired comparison that answers "is B actually better than A, or do
    * they just disagree" (an unpaired accuracy diff throws away the
    * per-row pairing and loses power). Counts the discordant cells
    * (b = A right / B wrong, c = A wrong / B right) and reports the
    * continuity-corrected statistic χ² = (max(|b−c|−1, 0))² / (b+c).
    *
    * One pass, one aggregate, no shuffle beyond the single output row.
    * The statistic is an integer ratio (one IEEE division, 9 dp) — NULL
    * when the classifiers never disagree (b+c = 0). Returns one row:
    * (n, both_right, both_wrong, b_only_a, c_only_b, mcnemar_chi2).
    */
  def mcnemar(df: DataFrame, label: Column, predA: Column, predB: Column)
      : DataFrame = {
    val okA = predA === label
    val okB = predB === label
    df.agg(count(lit(1)).as("n"),
        sum(when(okA && okB, 1L).otherwise(0L)).as("both_right"),
        sum(when(!okA && !okB, 1L).otherwise(0L)).as("both_wrong"),
        sum(when(okA && !okB, 1L).otherwise(0L)).as("b_only_a"),
        sum(when(!okA && okB, 1L).otherwise(0L)).as("c_only_b"))
      .withColumn("mcnemar_chi2",
        when(col("b_only_a") + col("c_only_b") > 0, {
          val num = greatest(abs(col("b_only_a") - col("c_only_b")) - 1,
            lit(0L))
          round((num * num).cast(DoubleType) /
            (col("b_only_a") + col("c_only_b")), 9)
        }))
  }

  /** Wilson score lower bound of the per-key success ratio — how to rank
    * by a ratio without letting 1-for-1 keys beat 90-for-100 keys (the
    * standard "sort by average rating" fix; Wilson 1927). One group-by
    * shuffle; the bound itself is a fixed per-row IEEE sequence (sqrt is
    * correctly rounded on any IEEE engine) rounded to 9 dp, mirrored
    * verbatim in the oracle. Returns keys + (n, s, wilson_lb).
    */
  def wilsonLowerBound(df: DataFrame, keyCols: Seq[String],
      success: Column, z: Double): DataFrame = {
    val agg = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("s"))
    val zz = lit(z) * lit(z)
    val nD = col("n").cast(DoubleType)
    val p = col("s").cast(DoubleType) / nD
    val lb = (p + zz / (nD * 2) -
      lit(z) * sqrt((p * (lit(1.0) - p) + zz / (nD * 4)) / nD)) /
      (lit(1.0) + zz / nD)
    agg.select(keyCols.map(col) ++
      Seq(col("n"), col("s"), round(lb, 9).as("wilson_lb")): _*)
  }

  /** Referential-integrity audit of one foreign-key edge — the data
    * contract every star-schema ingest asserts before anything joins:
    * child rows whose key has no parent are silent row loss in every
    * downstream inner join. Reports row and distinct-key orphan counts
    * (a thousand orphan rows behind one missing parent key is a very
    * different incident than a thousand missing keys).
    *
    * Shape at scale: one left-anti join on the key (the parent side
    * broadcast when dimension-sized) + one distinct over orphan keys —
    * no full-join materialization. NULL child keys count as orphan rows
    * but not as keys (NULL never equals a parent). Returns one row:
    * (edge, n_rows, n_orphan_rows, n_orphan_keys, orphan_rate).
    */
  def fkAudit(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, edge: String): DataFrame = {
    val totals = child.agg(count(lit(1)).as("n_rows"))
    val orphans = child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_rows"),
        count_distinct(col("__k")).as("n_orphan_keys"))
    totals.crossJoin(broadcast(orphans))
      .select(lit(edge).as("edge"), col("n_rows"), col("n_orphan_rows"),
        col("n_orphan_keys"),
        round(col("n_orphan_rows").cast(DoubleType) / col("n_rows"), 9)
          .as("orphan_rate"))
  }

  /** Exact weighted median (lower median) per group: the smallest value
    * whose cumulative weight reaches half the group total —
    * `min { v : 2·W(≤v) ≥ W }`. The robust center for weighted samples
    * (price weighted by quantity, metric weighted by exposure) where the
    * weighted MEAN chases whales.
    *
    * Requires integer weights, which keeps the decision an exact integer
    * cross-multiply (`2·cum ≥ total`) — no interpolation, no IEEE
    * anywhere, bit-identical on any engine. The data collapses to the
    * per-group DISTINCT-VALUE grid in one shuffle (the KS-grid argument:
    * 2-dp money support is bounded); the cumulative walk windows over
    * that grid only. Returns (groupCols*, total_weight, w_median).
    */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
      groupCols: Seq[String]): DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 2))
    val grid = df
      .filter(v.isNotNull)
      .groupBy(groupCols.map(col) :+ v.as("__v"): _*)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val cum = Window.partitionBy(groupCols.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(groupCols.map(col): _*)
    grid
      .withColumn("__cw", sum("__w").over(cum))
      .withColumn("__tw", sum("__w").over(all))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(groupCols.map(col) :+ col("__tw").as("total_weight"): _*)
      .agg(min(col("__v")).cast(DoubleType).as("w_median"))
  }

  /** Exact join-size prediction WITHOUT executing the join — the planning
    * diagnostic run before committing a 100 TB shuffle (pairs with the
    * per-key skew report, [[graft.ops.Skew]]): per-key counts of both
    * sides join on the key (two count-relation shuffles, never data), and
    * |A ⋈ B| = Σ c_a·c_b over shared keys. `max_key_rows` is the largest
    * single key's contribution — the number that says "salt this join".
    * Returns one row: (n_left, n_right, n_keys_left, n_keys_right,
    * n_keys_both, join_rows, max_key_rows).
    */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val la = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
    val ra = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
    val joined = la.join(ra, Seq("k"))
      .agg(count(lit(1)).as("n_keys_both"),
        sum((col("ca") * col("cb")).cast(DecimalType(38, 0)))
          .cast("long").as("join_rows"),
        max(col("ca") * col("cb")).as("max_key_rows"))
    val lt = la.agg(sum("ca").as("n_left"),
      count(lit(1)).as("n_keys_left"))
    val rt = ra.agg(sum("cb").as("n_right"),
      count(lit(1)).as("n_keys_right"))
    lt.crossJoin(broadcast(rt)).crossJoin(broadcast(joined))
      .select("n_left", "n_right", "n_keys_left", "n_keys_right",
        "n_keys_both", "join_rows", "max_key_rows")
  }

  /** Pairwise Pearson correlation of ≤2-dp numeric columns in ONE pass:
    * a single wide aggregate collects n, Σx, Σx² and every Σxy cross
    * product (all exact DECIMAL — 2-dp inputs make 4-dp products exact),
    * then each of the d(d+1)/2 correlations is plain arithmetic over the
    * 1-row result. Listwise-complete semantics: rows with a null in ANY
    * profiled column are dropped, so every pair shares one n.
    *
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²)), computed
    * as a FIXED IEEE sequence over doubles cast from identical exact
    * decimals — bit-identical on any engine; zero-variance pairs return
    * NULL instead of dividing by zero. Returns (col_a, col_b, n, corr)
    * for the i<j upper triangle.
    */
  def pearsonMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "pearsonMatrix needs at least two columns")
    val Money = DecimalType(18, 2)
    val SumT = DecimalType(38, 4)
    val complete = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast(Money).as(c)): _*)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c)).as(s"__s_$c"),
        sum((col(c) * col(c)).cast(SumT)).as(s"__ss_$c"))
    } ++ pairs.map { case (a, b) =>
      sum((col(a) * col(b)).cast(SumT)).as(s"__sp_${a}__$b")
    } :+ count(lit(1)).as("__n")
    val wide = complete.agg(aggs.head, aggs.tail: _*)
    def d(c: Column): Column = c.cast(DoubleType)
    val nD = d(col("__n"))
    val rows = pairs.map { case (a, b) =>
      val num = nD * d(col(s"__sp_${a}__$b")) - d(col(s"__s_$a")) * d(col(s"__s_$b"))
      val dx = nD * d(col(s"__ss_$a")) - d(col(s"__s_$a")) * d(col(s"__s_$a"))
      val dy = nD * d(col(s"__ss_$b")) - d(col(s"__s_$b")) * d(col(s"__s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        when(dx > 0 && dy > 0,
          round(num / (sqrt(dx) * sqrt(dy)), 9)).as("corr"))
    }
    wide.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Deterministic subsample-bootstrap confidence interval for a column
    * mean — the "is this metric move real?" answer with NO random state:
    * resample `b`'s membership is the md5 draw on (id, b) (the
    * [[Prep.hashBucket]] idiom — identical on any engine/partitioning/
    * run), so this is the m-out-of-n bootstrap (Bickel et al. 1997;
    * keep-fraction subsampling rather than with-replacement draws, which
    * would need per-row multiplicities no portable hash gives cheaply).
    * CI bounds are DISCRETE permille quantiles of the resample means via
    * the integer grid predicate (`1000·cum ≥ q·B` — the
    * engines-interpolate-differently lesson).
    *
    * Shape at scale: one bounded ×B explode, one (resample) group-by of
    * exact DECIMAL sums, then all quantile work happens on the B-row mean
    * relation. Returns (n, mean, n_resamples, ci_lo, ci_hi).
    */
  def bootstrapCi(df: DataFrame, idCol: String, valueCol: String,
      resamples: Int, keepPct: Int, loPermille: Int, hiPermille: Int)
      : DataFrame = {
    require(resamples > 1 && keepPct > 0 && keepPct <= 100)
    require(loPermille >= 0 && hiPermille <= 1000 && loPermille < hiPermille)
    val xd = col(valueCol).cast(DecimalType(18, 2))
    val base = df.select(col(idCol).cast("string").as("__id"), xd.as("__v"))
      .filter(col("__v").isNotNull)
    val full = base.agg(count(lit(1)).as("n"),
      round(sum(col("__v")).cast(DoubleType) / count(lit(1)), 9).as("mean"))
    val means = base
      .withColumn("__b", explode(sequence(lit(1), lit(resamples))))
      .filter(Prep.hashBucket(
        concat(col("__id"), lit(":"), col("__b")), 100) < keepPct)
      .groupBy("__b")
      .agg(round(sum(col("__v")).cast(DoubleType) / count(lit(1)), 9)
        .as("m"))
    val perM = means.groupBy("m").agg(count(lit(1)).as("c"))
    val cum = Window.orderBy("m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val ci = perM
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("nb", sum(col("c")).over(all))
      .agg(max(col("nb")).as("n_resamples"),
        min(when(col("cum") * 1000 >= col("nb") * loPermille, col("m")))
          .as("ci_lo"),
        min(when(col("cum") * 1000 >= col("nb") * hiPermille, col("m")))
          .as("ci_hi"))
    full.crossJoin(ci)
  }

  // χ²(1 df) critical values as exact literals — the DCG-weight rule: no
  // engine computes a distribution function at runtime
  private val Chi2Crit5 = new JBigDecimal("3.841458821")
  private val Chi2Crit1 = new JBigDecimal("6.634896601")

  /** Hash-assigned A/B experiment audit: deterministic 2-arm assignment
    * (md5 bucket of the unit id — the library's sampling rule, so any
    * engine reproduces the split), a sample-ratio-mismatch (SRM) χ²
    * against the intended 50/50 — THE go/no-go data-quality gate every
    * experimentation platform runs before reading an effect (a biased
    * assignment invalidates everything downstream) — and the 2×2
    * conversion χ² for the effect itself.
    *
    * All-integer discipline: SRM χ² for an even split collapses to
    * (n₀−n₁)²/n; the 2×2 statistic is n·(ad−bc)²/(r₀·r₁·c₀·c₁) with the
    * products carried in DECIMAL(38,0) (five BIGINT factors overflow a
    * long at ~10⁴ units); each spends ONE IEEE division rounded 9 dp.
    * Significance flags compare against χ²(1) critical values inlined as
    * exact literals in plan AND oracle — no runtime distribution
    * function. One distinct-unit aggregate; output is ONE row:
    * (n_units, n_arm0, n_arm1, conv0, conv1, cr0, cr1, srm_chi2,
    * srm_flag_5pct, effect_chi2, effect_flag_5pct, effect_flag_1pct).
    */
  def abExperiment(df: DataFrame, unitCol: Column, convertedCol: Column)
      : DataFrame = {
    val big = DecimalType(38, 0)
    val units = df.groupBy(unitCol.cast("string").as("__u"))
      .agg(max(when(convertedCol, 1L).otherwise(0L)).as("__c"))
      .select(col("__u"), col("__c"),
        Prep.hashBucket(col("__u"), 2).as("__arm"))
    val agg = units.agg(count(lit(1)).as("n_units"),
      sum(when(col("__arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
      sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("n_arm1"),
      sum(when(col("__arm") === 0, col("__c")).otherwise(0L)).as("conv0"),
      sum(when(col("__arm") === 1, col("__c")).otherwise(0L)).as("conv1"))
    val d = col("n_arm0") - col("n_arm1")
    val a = col("conv0")
    val b = col("n_arm0") - col("conv0")
    val c = col("conv1")
    val dd = col("n_arm1") - col("conv1")
    val det = (a.cast(big) * dd - b.cast(big) * c)
    val denom = col("n_arm0").cast(big) * col("n_arm1") *
      (col("conv0") + col("conv1")) *
      (col("n_units") - col("conv0") - col("conv1"))
    agg
      .withColumn("cr0", when(col("n_arm0") > 0,
        round(col("conv0").cast(DoubleType) / col("n_arm0"), 9)))
      .withColumn("cr1", when(col("n_arm1") > 0,
        round(col("conv1").cast(DoubleType) / col("n_arm1"), 9)))
      .withColumn("srm_chi2", when(col("n_units") > 0,
        round((d * d).cast(DoubleType) / col("n_units"), 9)))
      .withColumn("srm_flag_5pct",
        col("srm_chi2") > lit(Chi2Crit5).cast(DoubleType))
      .withColumn("effect_chi2", when(denom > 0,
        round(col("n_units").cast(DoubleType) *
          (det * det).cast(DoubleType) / denom.cast(DoubleType), 9)))
      .withColumn("effect_flag_5pct",
        col("effect_chi2") > lit(Chi2Crit5).cast(DoubleType))
      .withColumn("effect_flag_1pct",
        col("effect_chi2") > lit(Chi2Crit1).cast(DoubleType))
  }

  /** ε-differentially-private count release (Laplace mechanism, Dwork et
    * al. 2006) over group counts — the third member of the governance
    * family next to [[kAnonymity]] and the store's user erasure: each
    * group's count is perturbed with Laplace(1/ε) noise before release.
    * Sensitivity 1 holds when each individual contributes AT MOST ONE
    * row (one-row-per-entity relations, or pre-cap contributions with
    * [[Prep.keyCap]]); ε composes additively across repeated releases.
    *
    * Noise is SEEDED, not sampled: u ∈ (0,1) comes from 52 md5 bits of
    * (seed, group key) — u = (v + 0.5)/2⁵², so u−0.5, |·|, 1−2|u−0.5|
    * are all EXACT binary rationals (power-of-two scaling only) — and
    * the inverse CDF −sgn(u−½)·ln(1−2|u−½|)/ε spends one libm `ln` on an
    * exact rational (irrational result — engine-safe to round 9 dp) plus
    * exact-or-fixed IEEE steps. Deterministic replay is what makes the
    * release auditable (and DuckDB-oracle-checkable); a production
    * release rotates the seed per publication, which is exactly the ε
    * composition the scaladoc above prices.
    *
    * Returns (groupCols…, true_count, noise, noisy_count) — the RELEASE
    * view is `select(group…, noisy_count)`; true_count/noise stay here
    * for the audit trail only. One group-by (map-side combined); the
    * noise expression is per-GROUP arithmetic on the collapsed relation.
    */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val counted = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("true_count"))
    val key = concat_ws("|",
      lit(seed) +: groupCols.map(c => col(c).cast("string")): _*)
    val v = conv(substring(md5(key), 1, 13), 16, 10).cast("long")
    val u = (v.cast(DoubleType) + lit(0.5)) / lit(4503599627370496.0)
    val q = u - lit(0.5)
    val noise = round(-signum(q) * log(lit(1.0) - lit(2.0) * abs(q))
      / lit(epsilon), 9)
    counted
      .withColumn("noise", noise)
      .withColumn("noisy_count",
        round(col("true_count").cast(DoubleType) + col("noise"), 9))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) between groups
    * `a` and `b` of `valueCol` — the nonparametric A/B screen for
    * skewed / heavy-tailed metrics where Welch-style mean comparison is
    * fragile: U counts cross-group wins, so one whale row shifts it by
    * at most its rank, not its magnitude.
    *
    * All-integer rank math on the doubled scale: the `t` rows tied at a
    * value share average rank `C + (t+1)/2` (`C` = exclusive pooled
    * cumulative), so `2·R_a = Σ_v ca·(2C + t + 1)` stays integral —
    * summed in DECIMAL(38,0) alongside the tie term `Σ(t³ − t)`. The
    * normal approximation with tie correction reduces to exact integers
    * around ONE IEEE division + sqrt:
    * `z = (2U_a − n_a·n_b) / (2·σ)`,
    * `σ² = n_a·n_b·((n+1)n(n−1) − Σ(t³−t)) / (12·n·(n−1))` — irrational
    * via the sqrt, hence engine-safe to round 9 dp (the χ² discipline).
    *
    * Scale shape: one group-by collapses the data to the distinct-value
    * grid; the only cumulative walk runs through [[SaltedGrid]] (a
    * continuous metric makes the grid row-scale — never one window
    * task); the final statistics aggregate THAT grid. Returns one row:
    * (n_a, n_b, u_a, u_b, tie_term, z, significant_5pct) — z null when
    * σ = 0 (all values tied) or a group is empty.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val big = DecimalType(38, 0)
    val xd = col(valueCol).cast(DecimalType(18, 2))
    val perV = df.filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(xd.as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
      .groupBy("v").agg(sum("ia").as("ca"), sum("ib").as("cb"))
    val walked = SaltedGrid.cumulative(perV, "v", Seq("ca", "cb"))
    val t = col("ca") + col("cb")
    val cExcl = col("__cum_ca") + col("__cum_cb") - t
    val agg = walked.select(
        col("__tot_ca").as("na"), col("__tot_cb").as("nb"),
        (col("ca").cast(big) *
          (lit(2L) * cExcl + t + lit(1L)).cast(big)).as("r2c"),
        (t.cast(big) * t.cast(big) * t.cast(big) - t.cast(big)).as("tc"))
      .groupBy("na", "nb")
      .agg(sum("r2c").as("ra2"), sum("tc").as("ties"))
    val naB = col("na").cast(big)
    val nbB = col("nb").cast(big)
    val nB = naB + nbB
    val u2a = col("ra2") - naB * (naB + lit(1L).cast(big)) // = 2·U_a
    val sigNum = naB * nbB *
      ((nB + lit(1L).cast(big)) * nB * (nB - lit(1L).cast(big)) -
        col("ties"))
    val sigDen = lit(12L).cast(big) * nB * (nB - lit(1L).cast(big))
    val z = round((u2a - naB * nbB).cast(DoubleType) /
      (lit(2.0) * sqrt(sigNum.cast(DoubleType) / sigDen.cast(DoubleType))),
      9)
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
        (u2a.cast(DoubleType) / lit(2.0)).as("u_a"),
        ((lit(2L).cast(big) * naB * nbB - u2a).cast(DoubleType) / lit(2.0))
          .as("u_b"),
        col("ties").cast(DoubleType).as("tie_term"),
        when(sigNum > lit(0L).cast(big), z).as("z"))
      .withColumn("significant_5pct",
        when(col("z").isNotNull,
          abs(col("z")) > lit(ZCrit5).cast(DoubleType)))
  }

  /** |z| threshold at two-sided 5% — 9-dp literal of Φ⁻¹(0.975), the
    * [[abExperiment]] Chi2Crit5 fixed-critical-value discipline (no
    * erf/CDF libm calls, which carry no cross-engine bit guarantee).
    */
  private val ZCrit5 = new JBigDecimal("1.959963985")

  /** Covariate balance table for a hash-armed experiment —
    * standardized mean differences (the |SMD| < 0.1 randomization
    * health check every A/B readout should open with):
    * SMD = (m₁ − m₀) / √((s₀² + s₁²)/2) per covariate, where s² is the
    * per-arm sample variance. A hash split should balance every
    * PRE-experiment covariate; a large |SMD| means the split (or the
    * logging) is broken before any effect is read.
    *
    * Input is a LONG relation (unit, covariate, x) with integer-valued
    * x (cents/counts); arms come from the shared [[Prep.hashBucket]]
    * split of the unit. Exactness: per-(covariate, arm) moments are
    * exact integers in DECIMAL(38,0); means one division each, s² the
    * (nΣx²−(Σx)²)/(n(n−1)) form, and the SMD rounds 9 dp riding its
    * sqrt (irrational denominator). Returns one row per covariate:
    * (covariate, n0, n1, mean0, mean1, smd, balanced_0p1) — smd null
    * when either arm has < 2 rows or both variances are 0.
    */
  def covariateBalance(df: DataFrame, unitCol: Column,
      covCol: Column, xCol: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val base = df.select(covCol.cast("string").as("cov"),
      Prep.hashBucket(unitCol, 2).as("arm"), xCol.cast("long").as("x"))
    val m = base.groupBy("cov", "arm")
      .agg(count(lit(1)).as("n"), sum(col("x").cast(big)).as("s"),
        sum((col("x").cast(big) * col("x").cast(big)).cast(big)).as("s2"))
    def pick(a: Int, c: String): Column =
      max(when(col("arm") === a, col(c)))
    val one = m.groupBy("cov").agg(
      coalesce(pick(0, "n"), lit(0L)).as("n0"),
      coalesce(pick(1, "n"), lit(0L)).as("n1"),
      pick(0, "s").as("sa0"), pick(1, "s").as("sa1"),
      pick(0, "s2").as("ss0"), pick(1, "s2").as("ss1"))
    val dbl = DoubleType
    def mean(s: String, n: String): Column =
      col(s).cast(dbl) / col(n).cast(dbl)
    def variance(n: String, s: String, s2: String): Column =
      (col(n).cast(big) * col(s2) - col(s) * col(s)).cast(dbl) /
        (col(n).cast(big) * (col(n) - 1).cast(big)).cast(dbl)
    val pooled = (variance("n0", "sa0", "ss0") +
      variance("n1", "sa1", "ss1")) / lit(2.0)
    val ok = col("n0") >= 2 && col("n1") >= 2
    val smd = round((mean("sa1", "n1") - mean("sa0", "n0")) / sqrt(pooled),
      9)
    one.select(col("cov").as("covariate"), col("n0"), col("n1"),
        when(col("n0") > 0, mean("sa0", "n0")).as("mean0"),
        when(col("n1") > 0, mean("sa1", "n1")).as("mean1"),
        when(ok && pooled > 0, smd).as("smd"))
      .withColumn("balanced_0p1",
        when(col("smd").isNotNull, abs(col("smd")) < 0.1))
  }

  /** Empirical-Bayes rate shrinkage (beta-binomial moment matching;
    * Robbins 1956 lineage) — the smoothed per-key rate a ranking
    * actually uses where [[wilsonLowerBound]] gives a conservative
    * bound: a key with 1/1 successes shrinks hard toward the corpus
    * prior, a key with 900/1000 barely moves. Moments fit the
    * Beta(α, β) prior: κ = m(1−m)/v − 1, α = mκ, β = (1−m)κ; the
    * posterior mean is (x + α)/(n + α + β).
    *
    * Determinism: each raw rate quantizes by TRUNCATING nano division
    * ((x·10⁹) div n — rational, so never a decimal round), the prior
    * moments are exact DECIMAL(38,0) combinations of those nano longs
    * (A = NΣp² − (Σp)², the ACF discipline), and m, v, κ, α, β and
    * every smoothed rate are fixed IEEE sequences emitted UNROUNDED.
    * Prior columns null (raw rates kept) when the between-key variance
    * is 0 or the moment estimate leaves the Beta family (κ ≤ 0).
    *
    * Scale shape: one key collapse, one 1-row moment aggregate
    * broadcast back, a per-row smoothing expression. Returns one row
    * per key: (key…, n, x, raw_rate, alpha, beta, smoothed_rate).
    */
  def ebShrinkage(df: DataFrame, keyCols: Seq[String],
      successCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val big = DecimalType(38, 0)
    val perKey = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(successCol, 1L).otherwise(0L)).as("x"))
      .withColumn("__pn", expr("(x * 1000000000) div n"))
    val m = perKey.agg(count(lit(1)).cast(big).as("nk"),
      sum(col("__pn").cast(big)).as("sp"),
      sum((col("__pn").cast(big) * col("__pn").cast(big)).cast(big))
        .as("spp"))
    val dbl = DoubleType
    val nkD = col("nk").cast(dbl)
    val mHat = col("sp").cast(dbl) / (nkD * lit(1.0e9))
    val vHat = (col("nk") * col("spp") - col("sp") * col("sp")).cast(dbl) /
      (nkD * nkD * lit(1.0e18))
    val kappa = mHat * (lit(1.0) - mHat) / vHat - lit(1.0)
    val prior = m.select(
      when(vHat > 0 && kappa > 0, mHat * kappa).as("__alpha"),
      when(vHat > 0 && kappa > 0, (lit(1.0) - mHat) * kappa).as("__beta"))
    perKey.crossJoin(broadcast(prior))
      .select(keyCols.map(col) ++ Seq(col("n"), col("x"),
        (col("x").cast(dbl) / col("n").cast(dbl)).as("raw_rate"),
        col("__alpha").as("alpha"), col("__beta").as("beta"),
        ((col("x").cast(dbl) + col("__alpha")) /
          (col("n").cast(dbl) + col("__alpha") + col("__beta")))
          .as("smoothed_rate")): _*)
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) — the
    * industry-standard A/B sensitivity boost: adjust each unit's
    * experiment metric by its PRE-period covariate,
    * Y' = Y − θ·(X − x̄), θ = cov(X,Y)/var(X), which shrinks metric
    * variance by corr²(X,Y) without biasing the treatment contrast
    * (θ is fit POOLED, so both arms shift identically in expectation).
    *
    * Exactness (the ACF n-scaled discipline): all moments are exact
    * cent integers in DECIMAL(38,0) — θ = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    * is ONE division of exact integers, each arm/global mean one more,
    * the adjusted means a fixed IEEE sequence, the variance-reduction
    * ratio corr² = A²/(B·C) fixed-sequence doubles — everything
    * emitted UNROUNDED. One unit collapse + one 1-row moment
    * aggregate; arms via the shared [[Prep.hashBucket]] md5 split.
    * Returns one row: (n_units, n_arm0, n_arm1, theta, mean_y0,
    * mean_y1, adj_mean_y0, adj_mean_y1, raw_diff, adj_diff,
    * var_reduction) — adjusted values null when var(X) = 0.
    */
  def cuped(df: DataFrame, unitCol: Column, preCol: Column,
      postCol: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val preCents = (preCol.cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val postCents = (postCol.cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val units = df.groupBy(unitCol.cast("string").as("__u"))
      .agg(coalesce(sum(preCents), lit(0L)).as("x"),
        coalesce(sum(postCents), lit(0L)).as("y"))
      .select(col("x"), col("y"), Prep.hashBucket(col("__u"), 2).as("arm"))
    val m = units.agg(count(lit(1)).cast(big).as("n"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(col("x").cast(big)).as("sx"), sum(col("y").cast(big)).as("sy"),
      sum(when(col("arm") === 0, col("x"))).cast(big).as("sx0"),
      sum(when(col("arm") === 1, col("x"))).cast(big).as("sx1"),
      sum(when(col("arm") === 0, col("y"))).cast(big).as("sy0"),
      sum(when(col("arm") === 1, col("y"))).cast(big).as("sy1"),
      sum((col("x").cast(big) * col("y").cast(big)).cast(big)).as("sxy"),
      sum((col("x").cast(big) * col("x").cast(big)).cast(big)).as("sxx"),
      sum((col("y").cast(big) * col("y").cast(big)).cast(big)).as("syy"))
    val dbl = DoubleType
    val a = (col("n") * col("sxy") - col("sx") * col("sy")).cast(big)
    val b = (col("n") * col("sxx") - col("sx") * col("sx")).cast(big)
    val c = (col("n") * col("syy") - col("sy") * col("sy")).cast(big)
    val theta = a.cast(dbl) / b.cast(dbl)
    def mean(s: String, n: String): Column =
      col(s).cast(dbl) / col(n).cast(dbl)
    val xBar = col("sx").cast(dbl) / col("n").cast(dbl)
    def adj(sy: String, sx: String, n: String): Column =
      (mean(sy, n) - theta * (mean(sx, n) - xBar)) / lit(100.0)
    val ok = b.cast(dbl) > 0 && col("n0") > 0 && col("n1") > 0
    m.select(col("n").cast("long").as("n_units"), col("n0").as("n_arm0"),
      col("n1").as("n_arm1"),
      when(b.cast(dbl) > 0, theta).as("theta"),
      when(col("n0") > 0, mean("sy0", "n0") / lit(100.0)).as("mean_y0"),
      when(col("n1") > 0, mean("sy1", "n1") / lit(100.0)).as("mean_y1"),
      when(ok, adj("sy0", "sx0", "n0")).as("adj_mean_y0"),
      when(ok, adj("sy1", "sx1", "n1")).as("adj_mean_y1"),
      when(col("n0") > 0 && col("n1") > 0,
        (mean("sy1", "n1") - mean("sy0", "n0")) / lit(100.0))
        .as("raw_diff"),
      when(ok, adj("sy1", "sx1", "n1") - adj("sy0", "sx0", "n0"))
        .as("adj_diff"),
      when(b.cast(dbl) > 0 && c.cast(dbl) > 0,
        a.cast(dbl) * a.cast(dbl) / (b.cast(dbl) * c.cast(dbl)))
        .as("var_reduction"))
  }

  /** Difference-in-differences estimator (the canonical two-period
    * quasi-experimental read, Card & Krueger 1994 form): units split
    * into treat/control by the [[Prep.hashBucket]] md5 arm, periods by
    * a caller-supplied `post` predicate, and
    * DiD = (m_treat,post − m_treat,pre) − (m_ctrl,post − m_ctrl,pre)
    * — the treatment effect net of both the fixed group gap and the
    * common time trend (what a naive post-vs-pre or treat-vs-ctrl
    * single difference conflates).
    *
    * Exactness: cent sums and counts per cell are exact integers; each
    * cell mean is ONE division, the DiD is a fixed IEEE sequence over
    * those four doubles, and everything emits UNROUNDED (the Welch-dof
    * argument). One group-by collapses the data to 4 cells. Returns
    * one row: (n_ctrl_pre, n_ctrl_post, n_treat_pre, n_treat_post,
    * mean_ctrl_pre, mean_ctrl_post, mean_treat_pre, mean_treat_post,
    * did) — did null when any cell is empty.
    */
  def diffInDiff(df: DataFrame, unitCol: Column, postCol: Column,
      valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val cells = df.filter(col(valueCol).isNotNull)
      .select(Prep.hashBucket(unitCol, 2).as("__arm"),
        postCol.cast("boolean").as("__post"), cents.as("__v"))
      .groupBy("__arm", "__post")
      .agg(count(lit(1)).as("n"), sum("__v").as("s"))
    def cell(arm: Int, post: Boolean, c: String): Column =
      max(when(col("__arm") === arm && col("__post") === post, col(c)))
    val one = cells.agg(
      coalesce(cell(0, false, "n"), lit(0L)).as("n00"),
      coalesce(cell(0, true, "n"), lit(0L)).as("n01"),
      coalesce(cell(1, false, "n"), lit(0L)).as("n10"),
      coalesce(cell(1, true, "n"), lit(0L)).as("n11"),
      cell(0, false, "s").as("s00"), cell(0, true, "s").as("s01"),
      cell(1, false, "s").as("s10"), cell(1, true, "s").as("s11"))
    val dbl = DoubleType
    def mean(s: String, n: String): Column =
      when(col(n) > 0, col(s).cast(dbl) / (col(n).cast(dbl) * lit(100.0)))
    def meanC(s: String, n: String): Column =
      col(s).cast(dbl) / col(n).cast(dbl)
    val ok = col("n00") > 0 && col("n01") > 0 && col("n10") > 0 &&
      col("n11") > 0
    val didCents = (meanC("s11", "n11") - meanC("s10", "n10")) -
      (meanC("s01", "n01") - meanC("s00", "n00"))
    one.select(col("n00").as("n_ctrl_pre"), col("n01").as("n_ctrl_post"),
      col("n10").as("n_treat_pre"), col("n11").as("n_treat_post"),
      mean("s00", "n00").as("mean_ctrl_pre"),
      mean("s01", "n01").as("mean_ctrl_post"),
      mean("s10", "n10").as("mean_treat_pre"),
      mean("s11", "n11").as("mean_treat_post"),
      when(ok, didCents / lit(100.0)).as("did"))
  }

  /** Per-category seeded randomization test of the group mean
    * difference + Benjamini–Hochberg FDR control across the categories
    * (Fisher 1935; Benjamini & Hochberg 1995) — the multiple-testing
    * discipline a per-slice drift screen needs: testing every slice at
    * 5% guarantees false alarms as slices grow; BH caps the EXPECTED
    * false-discovery share instead.
    *
    * Everything is EXACT INTEGER arithmetic — no distributional
    * assumption, no CDF libm, no rounding discipline:
    *  - the statistic |mean_a − mean_b| compares via cent-integer
    *    cross-products: |d_obs| ≥ |d_r| ⇔
    *    |sA·nB − sB·nA|·(nAr·nBr) ≥ |sAr·nBr − sBr·nAr|·(nA·nB),
    *    DECIMAL(38,0)/HUGEINT exact;
    *  - reassignment is the dpNoisyCounts seeded-hash discipline, but
    *    amortized: TWO md5 digests per row (`seed|id|0`, `seed|id|1`)
    *    supply 256 independent bits, and resample r reads bit
    *    (r−1) mod 128 of digest (r−1) div 128 — hashing once per row
    *    instead of once per (row, resample) cut the ×B pass 2.2×
    *    (14.0 → 6.3 s at sf0.1; a randomization test — group sizes
    *    are binomial, and the sizes enter the cross-product exactly);
    *    with [[graft.GraftExtensions]] the whole reassignment-and-sum
    *    stage fuses into the `graft_perm_sums` typed aggregate
    *    ([[graft.functions.PermSums]]) — raw digest bytes, no ×B tuple
    *    explode, bit-identical by construction (`quality_perm_bh` at
    *    sf0.1: 11.3 → 1.4 s min-of-2);
    *  - the empirical p = (1 + #exceed)/(B+1) shares the denominator
    *    B+1 across categories, so BH's p_(i) ≤ (i/m)·α condition is
    *    the integer comparison k_i·m·αden ≤ i·αnum·(B+1), and ties
    *    rank by (k, category) — fully deterministic.
    *
    * Scale shape: ONE ×B explode of the slice rows (the bootstrap-ci
    * cost class, documented ×B), collapsed map-side to (category,
    * resample) partial sums; observed stats are one group-by; BH runs
    * on the m-row category relation. Returns per category:
    * (category, n_a, n_b, abs_mean_diff, n_exceed, p_value, bh_rank,
    * rejected), ordered by category.
    */
  def permutationTestBh(df: DataFrame, idCol: String, valueCol: String,
      catCol: String, groupCol: String, a: String, b: String,
      resamples: Int, seed: String, alphaNum: Int = 1,
      alphaDen: Int = 20): DataFrame = {
    require(resamples >= 1 && resamples <= 256,
      s"two 128-bit digests bound resamples at 256: $resamples")
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"bad alpha $alphaNum/$alphaDen")
    val big = DecimalType(38, 0)
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val base = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(col(catCol).cast("string").as("cat"),
        col(idCol).cast("string").as("id"), cents.as("v"),
        (col(groupCol) === a).as("ga"))
      .localCheckpoint()
    val obs = base.groupBy("cat").agg(
      sum(when(col("ga"), 1L).otherwise(0L)).as("na"),
      sum(when(col("ga"), col("v"))).as("sa"),
      sum(when(!col("ga"), 1L).otherwise(0L)).as("nb"),
      sum(when(!col("ga"), col("v"))).as("sb"))
    // (cat, r) resample sums: the graft_perm_sums aggregate computes all
    // B per-row assignment bits in one typed-buffer pass (two raw md5
    // digests per row, no hex round-trip, no ×B tuple explode — the
    // shuffle carries one 2B+2-long buffer per (partition, cat) instead
    // of B·N rows); the composable ×B explode below is the bit-identical
    // fallback for sessions without GraftExtensions, and the spelling
    // every oracle replays (PermSumsSpec pins kernel ≡ explode)
    val res =
      if (graft.functions.Kernels.registered("graft_perm_sums"))
        base.groupBy("cat")
          .agg(call_function("graft_perm_sums", col("id"), col("v"),
            lit(seed), lit(resamples)).as("__ps"))
          .select(col("cat"), explode(col("__ps")).as("__e"))
          .select(col("cat"), col("__e.r").as("r"),
            col("__e.nar").as("nar"), col("__e.sar").as("sar"),
            col("__e.nbr").as("nbr"), col("__e.sbr").as("sbr"))
      else {
        // bit (r−1) mod 128 of digest (r−1) div 128; hex digit value via
        // conv, bit via the power-of-two CASE mirrored in the oracle
        val flip = expr(
          """((cast(conv(substring(
            |     CASE WHEN (r - 1) div 128 = 0 THEN __h0 ELSE __h1 END,
            |     cast(((r - 1) % 128) div 4 as int) + 1, 1), 16, 10)
            |   as int)
            |  div (CASE ((r - 1) % 128) % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
            |       WHEN 2 THEN 4 ELSE 8 END)) % 2) = 0""".stripMargin)
        base
          .withColumn("__h0",
            md5(concat_ws("|", lit(seed), col("id"), lit("0"))))
          .withColumn("__h1",
            md5(concat_ws("|", lit(seed), col("id"), lit("1"))))
          .select(col("cat"), col("__h0"), col("__h1"), col("v"),
            explode(sequence(lit(1), lit(resamples))).as("r"))
          .select(col("cat"), col("r"), col("v"), flip.as("fa"))
          .groupBy("cat", "r").agg(
            sum(when(col("fa"), 1L).otherwise(0L)).as("nar"),
            coalesce(sum(when(col("fa"), col("v"))), lit(0L)).as("sar"),
            sum(when(!col("fa"), 1L).otherwise(0L)).as("nbr"),
            coalesce(sum(when(!col("fa"), col("v"))), lit(0L)).as("sbr"))
      }
    val dObs = abs(col("sa").cast(big) * col("nb").cast(big) -
      col("sb").cast(big) * col("na").cast(big))
    val dRes = abs(col("sar").cast(big) * col("nbr").cast(big) -
      col("sbr").cast(big) * col("nar").cast(big))
    // a degenerate resample (one side empty) has an undefined mean
    // diff — count it as exceeding (conservative, and deterministic)
    val exceeds = when(col("nar") === 0 || col("nbr") === 0, true)
      .otherwise(dRes * (col("na").cast(big) * col("nb").cast(big)) >=
        dObs * (col("nar").cast(big) * col("nbr").cast(big)))
    val perCat = res.join(obs, Seq("cat"))
      .select(col("cat"), col("na"), col("nb"), dObs.as("dobs"),
        when(exceeds, 1L).otherwise(0L).as("x"))
      .groupBy("cat", "na", "nb", "dobs")
      .agg(sum("x").as("n_exceed"))
    val m = Window.partitionBy()
    val wRank = Window.orderBy(col("n_exceed"), col("cat"))
    val bp1 = resamples + 1
    val ranked = perCat
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("bh_rank", row_number().over(wRank).cast("long"))
      .withColumn("__cond",
        (lit(1L) + col("n_exceed")) * col("m") * alphaDen <=
          col("bh_rank") * alphaNum * bp1)
      .withColumn("__istar",
        max(when(col("__cond"), col("bh_rank"))).over(m))
    ranked.select(col("cat").as("category"), col("na").as("n_a"),
        col("nb").as("n_b"),
        when(col("na") > 0 && col("nb") > 0,
          col("dobs").cast(org.apache.spark.sql.types.DoubleType) /
            (col("na").cast(big) * col("nb").cast(big) *
              lit(100L).cast(big))
              .cast(org.apache.spark.sql.types.DoubleType))
          .as("abs_mean_diff"),
        col("n_exceed"),
        ((lit(1L) + col("n_exceed"))
          .cast(org.apache.spark.sql.types.DoubleType) / lit(bp1.toDouble))
          .as("p_value"),
        col("bh_rank"),
        coalesce(col("bh_rank") <= col("__istar"), lit(false))
          .as("rejected"))
      .orderBy("category")
  }

  /** Welch's unequal-variance t-test (Welch 1947) between groups `a` and
    * `b` of a 2-dp metric — the parametric partner to [[mannWhitneyU]]:
    * reads the MEAN difference (what a revenue experiment ships on),
    * where U reads stochastic dominance.
    *
    * Exactness (the covariance micro-unit discipline): values become
    * CENT integers, so each group's (n, Σx, Σx²) accumulates exactly in
    * DECIMAL(38,0) at any partitioning, and the variance numerator
    * n·Σx² − (Σx)² is an exact integer. Everything after is a FIXED
    * IEEE sequence on those exact integers — one division per
    * s²ᵢ/nᵢ = (nᵢΣx²−(Σx)²)/(nᵢ²(nᵢ−1)), one per mean, sqrt, divide —
    * so t (sqrt-derived, irrational) rounds 9 dp engine-safely, and the
    * Welch–Satterthwaite dof is emitted UNROUNDED: every step is a
    * correctly-rounded scalar op on identical inputs, bit-identical on
    * any engine, while a 9-dp round of a rational could land on a
    * half-ulp tie. t is scale-invariant, so cent units change nothing;
    * means divide back to the metric's unit once.
    *
    * Scale shape: ONE map-side-combined group-by collapses the data to
    * two rows; everything else is arithmetic on a 1-row relation.
    * Returns (n_a, n_b, mean_a, mean_b, t, dof,
    * significant_5pct_normal) — t/dof null unless both groups have ≥2
    * rows and pooled variance > 0; the flag uses the large-sample
    * normal threshold (fixed [[ZCrit5]] literal, no t-CDF libm).
    */
  def welchTTest(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val big = DecimalType(38, 0)
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * lit(100))
      .cast(big)
    val perG = df.filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(when(col(groupCol) === a, 0).otherwise(1).as("g"),
        cents.as("c"))
      .groupBy("g").agg(count(lit(1)).as("n"), sum(col("c")).cast(big).as("s"),
        sum(col("c") * col("c")).cast(big).as("s2"))
    val one = perG.agg(
      coalesce(sum(when(col("g") === 0, col("n"))), lit(0L)).cast("long")
        .as("na"),
      coalesce(sum(when(col("g") === 1, col("n"))), lit(0L)).cast("long")
        .as("nb"),
      sum(when(col("g") === 0, col("s"))).cast(big).as("sa"),
      sum(when(col("g") === 1, col("s"))).cast(big).as("sb"),
      sum(when(col("g") === 0, col("s2"))).cast(big).as("sa2"),
      sum(when(col("g") === 1, col("s2"))).cast(big).as("sb2"))
    def q(n: Column, s: Column, s2: Column): Column = {
      val nB = n.cast(big)
      (nB * s2 - s * s).cast(DoubleType) /
        (nB * nB * (nB - lit(1L).cast(big))).cast(DoubleType)
    }
    val qa = q(col("na"), col("sa"), col("sa2"))
    val qb = q(col("nb"), col("sb"), col("sb2"))
    val ok = col("na") >= 2 && col("nb") >= 2
    val mDiff = col("sa").cast(DoubleType) / col("na").cast(DoubleType) -
      col("sb").cast(DoubleType) / col("nb").cast(DoubleType)
    val t = round(mDiff / sqrt(qa + qb), 9)
    val dof = (qa + qb) * (qa + qb) /
      (qa * qa / (col("na") - 1).cast(DoubleType) +
        qb * qb / (col("nb") - 1).cast(DoubleType))
    one.select(col("na").as("n_a"), col("nb").as("n_b"),
        (col("sa").cast(DoubleType) /
          (col("na").cast(DoubleType) * lit(100.0))).as("mean_a"),
        (col("sb").cast(DoubleType) /
          (col("nb").cast(DoubleType) * lit(100.0))).as("mean_b"),
        when(ok && qa + qb > 0, t).as("t"),
        when(ok && qa + qb > 0, dof).as("dof"))
      .withColumn("significant_5pct_normal",
        when(col("t").isNotNull,
          abs(col("t")) > lit(ZCrit5).cast(DoubleType)))
  }

  /** Otsu's threshold (Otsu 1979, "A Threshold Selection Method from
    * Gray-Level Histograms") over a ≤2-dp numeric column: the
    * unsupervised two-class cut that maximizes between-class variance —
    * the histogram-shaped answer to "where does 'low' end and 'high'
    * begin?" for a quality score or spend column, with no labels and no
    * quantile sketch.
    *
    * The column quantizes to exact integer cents; `bins` fixed-width
    * buckets come from the global [min, max] by exact integer floor
    * division (the [[graft.ops.Boost]] grid). Candidate cut t keeps bins
    * ≤ t on the left; the argmax objective is the scale-free form
    *
    *   (s₀·n − s·w₀)² / (w₀·(n−w₀))    [∝ w₀·w₁·(μ₀−μ₁)²]
    *
    * computed from exact BIGINT prefix sums. The products stay below 2⁵³
    * through ~10⁸ rows × 10⁵-cent values, so the BIGINT→double casts are
    * EXACT and the IEEE divide is engine-identical — no decimal→double
    * parity dependence anywhere (above that window the doubles round,
    * identically on any IEEE engine, and the cut degrades gracefully).
    * One row: the chosen cut's bin, its inclusive upper edge in original
    * units, the masses each side, and the rounded objective.
    *
    * Shape at scale: one row-scale aggregation to the `bins`-row
    * histogram; prefix sums and the argmax run on that bounded relation.
    */
  def otsuThreshold(df: DataFrame, valueCol: String, bins: Int = 32)
      : DataFrame = {
    require(bins >= 2, "otsu needs >= 2 bins")
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val base = df.select(cents.as("__v"))
    val mm = base.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val span = col("__mx") - col("__mn") + 1
    val bin = least(lit(bins - 1),
      (((col("__v") - col("__mn")) * bins -
        pmod((col("__v") - col("__mn")) * bins, span)) / span).cast("long"))
    val hist = base.crossJoin(broadcast(mm))
      .groupBy(bin.as("__b"))
      .agg(count(lit(1)).as("__nb"), sum(col("__v")).as("__sb"),
        max(col("__v")).as("__hi"),
        first(col("__mn")).as("__mn"), first(col("__mx")).as("__mx"),
        first(col("__n")).as("__n"), first(col("__s")).as("__st"))
    val w = Window.orderBy("__b") // bins-row relation: one-task window OK
    val pf = hist.select(col("__b"),
      sum(col("__nb")).over(w).as("__w0"),
      sum(col("__sb")).over(w).as("__s0"),
      max(col("__hi")).over(w).as("__edge"),
      col("__n"), col("__st"))
    val num = (col("__s0") * col("__n") - col("__st") * col("__w0"))
      .cast(DoubleType)
    val den = (col("__w0") * (col("__n") - col("__w0"))).cast(DoubleType)
    val cand = pf.filter(col("__w0") > 0 && col("__w0") < col("__n"))
      .select(col("__b"), col("__edge"), col("__w0"), col("__n"),
        (num * num / den).as("__obj"))
    cand.agg(max(struct(col("__obj"), (-col("__b")).as("__mb"),
        col("__edge"), col("__w0"), col("__n"))).as("__t"))
      .select((-col("__t.__mb")).cast("int").as("threshold_bin"),
        (col("__t.__edge").cast(DoubleType) / 100.0).as("threshold_value"),
        col("__t.__w0").as("n_below"),
        (col("__t.__n") - col("__t.__w0")).as("n_above"),
        round(col("__t.__obj"), 6).as("between_var_num"))
  }
}
