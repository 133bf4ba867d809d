package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot is bit-identical to the zip_with/aggregate fold") {
    val rnd = new Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(f))
    }
  }

  test("graft_dot handles length mismatch and empty arrays") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),
      (Array.empty[Double], Array(1.0))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(out == Seq(14.0, 0.0))
  }

  test("graft_sorted_intersect equals array_intersect size on sorted sets") {
    val rnd = new Random(11)
    val rows = Seq.fill(100)((
      rnd.shuffle((0L to 200L).toList).take(rnd.nextInt(50) + 1)
        .distinct.sorted.toArray,
      rnd.shuffle((0L to 200L).toList).take(rnd.nextInt(50) + 1)
        .distinct.sorted.toArray))
    val df = rows.toDF("a", "b")
    val out = df.select(
      call_function("graft_sorted_intersect", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, b) => assert(n == b) }
  }

  test("graft_md5_48 is bit-identical to the builtin hex/conv spelling " +
      "on random, unicode, empty and numeric keys") {
    import graft.ops.Prep
    val rnd = new Random(13)
    val keys = Seq("", " ", "a", "é¿😀", "the quick brown fox") ++
      Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(30) + 1).mkString) ++
      (0 until 100).map(i => (i * 2654435761L).toString)
    val df = keys.toDF("k")
    val out = df.select(
      Prep.hashBucket(col("k"), 64).as("native"),
      Prep.hashBucketBuiltin(col("k"), 64).as("builtin"),
      call_function("graft_md5_48", col("k")).as("h48"),
      conv(substring(md5(col("k")), 1, 12), 16, 10).cast("long").as("b48"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), r.toString)
      assert(r.getLong(2) == r.getLong(3), r.toString)
    }
    // NULL key stays NULL through the kernel, as through the builtin
    val n = Seq[Option[String]](None).toDF("k")
      .select(Prep.hashBucket(col("k"), 8)).collect().head
    assert(n.isNullAt(0))
  }

  test("graft_bucket_counts equals the explode+groupBy spelling on " +
      "random, multi-space, empty and unicode docs") {
    import graft.ops.Prep
    val rnd = new Random(17)
    val vocab = Vector("alpha", "beta", "γδ", "x", "longertoken", "0")
    val docs = Seq("", " ", "  ", "a  b", "é¿😀 é¿😀 é¿😀") ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(40))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val B = 8
    val kernel = df.select(col("id"),
        explode(call_function("graft_bucket_counts", col("text"), lit(B)))
          .as("bc"))
      .select(col("id"), col("bc.bucket").as("bucket"), col("bc.c").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val builtin = df.select(col("id"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .select(col("id"), Prep.hashBucket(col("tok"), B).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
      .toSet
    assert(kernel == builtin)
  }

  test("Kernels.md5hash48 auto-falls back to the builtin spelling on a " +
      "session without graft_md5_48 (vanilla-session callers keep working)") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import graft.ops.Prep
    // newSession() re-applies the extensions, so drop the kernel from its
    // (session-private) registry to stand in for a vanilla session
    val vanilla = spark.newSession()
    vanilla.sessionState.functionRegistry
      .dropFunction(new FunctionIdentifier("graft_md5_48"))
    SparkSession.setActiveSession(vanilla)
    try {
      assert(!vanilla.catalog.functionExists("graft_md5_48"))
      val df = vanilla.range(20).select(col("id").cast("string").as("k"))
      // analysis must succeed (this threw UNRESOLVED_ROUTINE before the
      // fallback) and values must equal the builtin spelling
      val got = df.select(Prep.hashBucket(col("k"), 7).as("b"),
          Prep.hashBucketBuiltin(col("k"), 7).as("w")).collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    } finally SparkSession.setActiveSession(spark)
  }

  test("graft_bucket_counts validates arity and bucket range with clear " +
      "messages instead of dying inside codegen") {
    val df = Seq("a b c").toDF("text")
    def analyze(c: org.apache.spark.sql.Column): Unit =
      df.select(c).queryExecution.analyzed
    def messageOf(t: Throwable): String = {
      var e = t; while (e.getCause != null && e.getCause != e) e = e.getCause
      Option(e.getMessage).getOrElse("") + Option(t.getMessage).getOrElse("")
    }
    val oneArg = intercept[Throwable](
      analyze(call_function("graft_bucket_counts", col("text"))))
    assert(messageOf(oneArg).contains("expects 2 arguments"))
    val zeroB = intercept[Throwable](
      analyze(call_function("graft_bucket_counts", col("text"), lit(0))))
    assert(messageOf(zeroB).contains("buckets must be in"))
    val negB = intercept[Throwable](
      analyze(call_function("graft_bucket_counts", col("text"), lit(-4))))
    assert(messageOf(negB).contains("buckets must be in"))
    val hugeB = intercept[Throwable](analyze(
      call_function("graft_bucket_counts", col("text"), lit(1 << 24))))
    assert(messageOf(hugeB).contains("buckets must be in"))
    // wrong-arity scalar kernel gets the arity message too
    val md5Arity = intercept[Throwable](analyze(
      call_function("graft_md5_48", col("text"), lit(1))))
    assert(messageOf(md5Arity).contains("expects 1 arguments"))
  }
}
