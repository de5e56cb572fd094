package org.apache.spark.sql.graft

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef

/** Driver-side state-store bootstrap for BATCH `transformWithState`.
  *
  * The TWS operator reads/writes through the state-store machinery even
  * in batch execution, and executors verify their store instances
  * against a driver RPC endpoint (`StateStoreCoordinator`) that only
  * streaming-query startup normally registers. A batch-only session
  * therefore fails with `RpcEndpointNotFoundException` on the first
  * batch TWS job. `StateStoreCoordinatorRef.forDriver` is the exact
  * call streaming startup makes — idempotent (an existing endpoint is
  * looked up, not re-created) — but `private[sql]`, hence this one-call
  * shim in the sql namespace; no other Spark internals are touched.
  */
object StateStoreBootstrap {
  def ensureCoordinator(spark: SparkSession): Unit =
    StateStoreCoordinatorRef.forDriver(SparkEnv.get, spark.sessionState.conf)
}
