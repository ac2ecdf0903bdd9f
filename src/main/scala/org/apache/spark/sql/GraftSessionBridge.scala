package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TableFunctionRegistry}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the package-private session internals needed to
  * register catalog functions on an ALREADY-BUILT session (the driver
  * contract hands `SparkEntry.queries` a live session, so the
  * `spark.sql.extensions` config route is not always available).
  * Same pattern as [[GraftColumnBridge]]: a minimal accessor in the
  * org.apache.spark.sql package, nothing else. */
object GraftSessionBridge {

  /** The session's mutable function registry. */
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** The session's mutable TABLE function registry (SQL TVFs). */
  def tableFunctionRegistry(spark: SparkSession): TableFunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry

  /** A DataFrame's logical plan — what a table-function builder must
    * return (the TVF route composes the engine's own DataFrame plan
    * into the calling SQL statement's plan tree). */
  def logicalPlan(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical

  /** Apply a [[SparkSessionExtensions]] injector's registered function
    * set to an arbitrary registry — lets a spec exercise the
    * `injectFunction` route without tearing down the shared test
    * session (extensions are otherwise only applied at session build). */
  def applyInjectedFunctions(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** Table-function twin of [[applyInjectedFunctions]]. */
  def applyInjectedTableFunctions(
      ext: SparkSessionExtensions, registry: TableFunctionRegistry): Unit =
    ext.registerTableFunctions(registry)

  /** Block until the SparkListener event bus has drained — the
    * deterministic settle a job-count spec needs (a fixed sleep
    * under-reads on a loaded host, ADVICE r12). `listenerBus` is
    * private[spark], hence the bridge. */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMs: Long): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
