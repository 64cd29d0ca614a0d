package org.apache.spark.sql.graftdiag

import org.apache.spark.sql.execution.streaming.state.StateStore

/** `private[sql]` access to the state-store registry for the bench and
  * verify drivers: after a bounded streaming drive stops, its
  * deactivated providers otherwise sit in the registry (holding their
  * in-memory state maps) until the 60s maintenance cadence notices —
  * across a 175-gate pass that is hundreds of providers of avoidable
  * old-gen. Unloading is safe between sequential queries: providers
  * reload from their checkpoints on next use. */
object StateShim {
  def unloadAllProviders(): Unit = StateStore.unloadAll()
}
