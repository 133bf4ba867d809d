package graft
object CountQueries {
  def main(args: Array[String]): Unit = {
    println(s"queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
  }
}
