package graft.tools

/** Cross-process probe for
  * [[graft.operators.ManifestArtifactStore.maintenanceLocked]]'s lease —
  * the manifest twin of [[LockProbe]]: a FRESH JVM acquires the lease of
  * the given store root through the REAL acquisition path (conditional
  * PUT on `_manifest/lease`), announces `ACQUIRED`, holds for the given
  * milliseconds, releases, and prints `RELEASED`. ManifestStoreSpec
  * spawns this to verify the lease excludes across real process
  * boundaries — in-JVM acquisition alone cannot, because the same-JVM
  * path queues on a monitor before ever touching the file. An optional
  * third arg overrides the lease expiry (no SparkSession exists in this
  * JVM to read `spark.graft.artifact.leaseMs` from); the renewal
  * heartbeat runs exactly as in a real holder, so the spec's
  * renewal-beats-expiry case exercises the production path.
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val holdMs = args(1).toLong
    val leaseMs = if (args.length > 2) args(2).toLong else 600000L
    graft.operators.ManifestArtifactStore.maintenanceLockedMs(root, leaseMs) {
      println("ACQUIRED"); System.out.flush()
      Thread.sleep(holdMs)
    }
    println("RELEASED"); System.out.flush()
  }
}
