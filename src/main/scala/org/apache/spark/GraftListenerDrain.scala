package org.apache.spark

/** Shim exposing the `private[spark]` listener-bus drain to graft's
  * measurement tooling: `waitUntilEmpty` deterministically blocks until all
  * queued listener events have been delivered, replacing the race-prone
  * fixed sleep in [[graft.tools.ShuffleProbe]] (ADVICE r10 — on a loaded
  * machine stage-completion events could arrive after the sleep and
  * silently under-report shuffle bytes).
  */
object GraftListenerDrain {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
