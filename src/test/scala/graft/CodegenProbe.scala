package graft

import org.apache.spark.sql.SparkSession

object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[2]")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sep1 = 1.toChar.toString
    val sep2 = 2.toChar.toString
    val merges = "a" + sep1 + "n" + sep2 + "an" + sep1 + "a"
    val df = Seq((1L, "banana")).toDF("id", "w")
    df.createOrReplaceTempView("t")
    val out = spark.sql(
      s"SELECT graft_bpe_word(w, '$merges', 10) AS e FROM t").collect()
    println("RESULT=" + out.map(_.getSeq[String](0).mkString(",")).mkString)
    val out2 = spark.sql(
      s"SELECT graft_bpe_apply(graft_bpe_word(w, '$merges', 1), 'an', 'a')" +
        " AS e, graft_bpe_pairs(array('a','b','a')) AS p FROM t").collect()
    println("RESULT2=" + out2.map(_.getSeq[String](0).mkString(",")).mkString)
    spark.stop()
  }
}
