package graft.tools
/** Dev tool: list queries() entries lacking an oracleSql restatement. */
object QCheck {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    val deferred = graft.SparkEntry.deferredOracleNames
    println("queries: " + qs.size)
    println("no-oracle: " + (qs -- os -- deferred).toSeq.sorted.mkString(", "))
    println("deferred (trained-artifact oracles, emitted after a run): " +
      (deferred -- os).toSeq.sorted.mkString(", "))
    println("orphan-oracle: " + (os -- qs).toSeq.sorted.mkString(", "))
  }
}
