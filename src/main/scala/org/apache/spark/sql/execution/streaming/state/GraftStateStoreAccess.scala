package org.apache.spark.sql.execution.streaming.state

/** Package-scoped accessor for StateStore's `private[sql]` lifecycle
  * surface. graft's per-query cleanup boundary
  * ([[graft.core.Intermediates.release]]) unloads the state-store
  * providers left behind by bounded (AvailableNow) streaming runs —
  * they hold their state maps on heap and a maintenance-scan slot
  * although their temp checkpoints are never revisited. */
object GraftStateStoreAccess {
  def unloadAllProviders(): Unit = StateStore.unloadAll()
}
