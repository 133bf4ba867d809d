package graft

import graft.ops.{LinearModel, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinearModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ridgeNormal: exact linear data recovers (b0, b1, b2) at " +
      "lambda = 0 with r2 = 1; ridge shrinks the slopes; a singular " +
      "system nulls at lambda = 0 and solves under any lambda > 0") {
    // y = 3 + 2·x1 − x2 exactly, over a full (x1, x2) grid
    val rows = for (a <- 1 to 20; b <- 1 to 5)
      yield (3L + 2L * a - b, a.toLong, b.toLong)
    val df = rows.toDF("y", "x1", "x2")
    val ols = LinearModel.ridgeNormal(df, "y", "x1", "x2", 0L).head()
    assert(math.abs(ols.getDouble(1) - 3.0) < 1e-9, ols.toString)
    assert(math.abs(ols.getDouble(2) - 2.0) < 1e-9, ols.toString)
    assert(math.abs(ols.getDouble(3) + 1.0) < 1e-9, ols.toString)
    assert(math.abs(ols.getDouble(4) - 1.0) < 1e-9, ols.toString)
    // ridge pulls the penalized slopes strictly toward zero and costs
    // fit (r2 < 1); the intercept is unpenalized
    val ridge = LinearModel.ridgeNormal(df, "y", "x1", "x2", 10000L)
      .head()
    assert(ridge.getDouble(2) > 0 && ridge.getDouble(2) < 2.0,
      ridge.toString)
    assert(ridge.getDouble(3) > -1.0 && ridge.getDouble(3) < 0,
      ridge.toString)
    assert(ridge.getDouble(4) < 1.0, ridge.toString)
    // constant feature = collinear with the intercept: singular at
    // lambda = 0 (NULL, never garbage), invertible at any lambda > 0
    val sing = df.withColumn("x2", lit(7L))
    val s0 = LinearModel.ridgeNormal(sing, "y", "x1", "x2", 0L).head()
    assert(s0.isNullAt(1) && s0.isNullAt(2) && s0.isNullAt(3))
    val s1 = LinearModel.ridgeNormal(sing, "y", "x1", "x2", 1000L).head()
    // solvable again — the slope is shrunk (uncentered ridge trades
    // slope mass to the unpenalized intercept) but finite and positive
    assert(!s1.isNullAt(1) && !s1.isNullAt(2) && !s1.isNullAt(3))
    assert(s1.getDouble(2) > 0 && s1.getDouble(2) < 2.0, s1.toString)
  }

  test("knnClassify: planted clusters vote their own label; a split " +
      "vote ties to the larger label (the argmax convention)") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.95f, 0.05f), 0),
      (3L, Array(0.0f, 1.0f), 7), (4L, Array(0.1f, 0.9f), 7),
      (5L, Array(0.05f, 0.95f), 7)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, emb, "vec_id", "embedding",
      "label", 2)
    assert(out.count() == 6)
    assert(out.filter(!col("correct")).count() == 0)
    assert(out.filter(col("n_votes") =!= 2).count() == 0)
    // a 45° query draws one neighbor from each cluster: 1-1 tie →
    // the larger label wins
    val q = Seq((100L, Array(0.7f, 0.7f), 0))
      .toDF("vec_id", "embedding", "label")
    val tied = Similarity.knnClassify(emb, q, "vec_id", "embedding",
      "label", 2).head()
    assert(tied.getAs[Int]("predicted") == 7, tied.toString)
    assert(tied.getAs[Long]("n_votes") == 1L)
    assert(!tied.getAs[Boolean]("correct"))
  }
}
