package graft.tools
/** Dev tool: list queries() entries lacking an oracleSql restatement. */
object QCheck {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println("queries: " + qs.size)
    println("no-oracle: " + (qs -- os).toSeq.sorted.mkString(", "))
    println("orphan-oracle: " + (os -- qs).toSeq.sorted.mkString(", "))
  }
}
