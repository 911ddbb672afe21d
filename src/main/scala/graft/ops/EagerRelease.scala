package graft.ops

import org.apache.spark.sql.DataFrame

/** Cache-release discipline for the multi-pass dedup/ANN queries, with
  * a plan-inspection escape hatch.
  *
  * Default (`enabled = true`): `apply` materializes `result` off its
  * cached lineage via an EAGER `localCheckpoint` and unpersists every
  * `cached` frame in a finally — so a query returns with no RDD blocks
  * left behind beyond its (small) checkpointed result. Verify runs all
  * 48 queries in one session; a leaked persist holds data-sized blocks
  * for the session's life (the r3 verdict's leak class).
  *
  * Plan inspection (`enabled = false`, set by [[graft.ExplainMain]] and
  * the plan-guardrail spec): the LAZY plan is returned instead, so
  * `explain` shows the real operators — an eagerly checkpointed frame
  * explains as an opaque `Scan ExistingRDD`, which would blind any
  * plan audit (cartesian guardrails, pushdown checks) to everything
  * upstream of the checkpoint. The cached frames are unpersisted
  * immediately (a no-op for never-materialized caches), so inspection
  * sessions trade per-side re-evaluation for a visible plan — correct
  * either way, only the caching differs. */
object EagerRelease {

  @volatile var enabled: Boolean = true

  def apply(result: => DataFrame, cached: DataFrame*): DataFrame =
    if (!enabled) {
      val r = result
      cached.foreach(_.unpersist())
      r
    } else
      try result.localCheckpoint(true)
      finally cached.foreach(_.unpersist())
}
