package org.apache.spark.sql.execution.streaming.state

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession

/** Batch-mode `transformWithState` needs the driver's
  * StateStoreCoordinator RPC endpoint, but Spark only registers it when
  * a STREAMING query starts (StreamingQueryManager); a batch-only
  * session running `TransformWithStateExec` therefore dies with
  * `RpcEndpointNotFoundException: StateStoreCoordinator`. This shim
  * lives in the state package to reach the package-private
  * [[StateStoreCoordinatorRef.forDriver]], which is idempotent (an
  * already-registered endpoint is looked up, not re-created) — so
  * calling it before a batch transformWithState query is safe in any
  * session state. Scoped to exactly one symbol; no other Spark
  * internals are touched. */
object GraftStateCoordinator {
  def ensureRegistered(spark: SparkSession): Unit =
    StateStoreCoordinatorRef.forDriver(SparkEnv.get,
      spark.sessionState.conf)
}
