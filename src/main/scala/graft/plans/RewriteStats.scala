package graft.plans

import scala.collection.concurrent.TrieMap

/** Session-wide counters of engine rewrite activity — the operational
  * visibility the reference provides through its per-query execution
  * metrics and thriftserver UI tab
  * (`execution/metrics/DruidQueryExecutionMetric.scala`,
  * `ui/DruidQueriesPage.scala` — SURVEY.md §4.4): how often each rule
  * actually fired, so an operator can tell whether the workload is being
  * served by the cube/lattice or silently falling through to fact scans.
  * Surfaced by `SHOW GRAFT STATS`; counters are cumulative per JVM, reset
  * with `CLEAR GRAFT CACHE`.
  */
object RewriteStats {
  private val counters = TrieMap.empty[String, Long]

  def inc(rule: String): Unit = {
    counters.updateWith(rule) { v => Some(v.getOrElse(0L) + 1L) }
    ()
  }

  def snapshot: Seq[(String, Long)] = counters.toSeq.sortBy(_._1)

  def reset(): Unit = counters.clear()

  /** Run `transform` on `plan`, counting one fire for `rule` when the tree
    * changed (Catalyst's transform returns the same instance when no case
    * applied anywhere, so reference inequality IS the fired test). Counts
    * are per optimizer invocation — a fixed-point batch that re-runs the
    * rule over an already-rewritten plan does not double-count, because the
    * second pass leaves the tree unchanged.
    */
  def counted[P <: AnyRef](rule: String, plan: P)(transform: P => P): P = {
    val out = transform(plan)
    if (!(out eq plan)) inc(rule)
    out
  }
}
