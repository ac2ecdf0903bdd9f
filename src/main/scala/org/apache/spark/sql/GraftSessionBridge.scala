package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

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

  /** Apply a [[SparkSessionExtensions]] injector's registered function
    * set to an arbitrary registry — lets a spec exercise the
    * `injectFunction` route without tearing down the shared test
    * session (extensions are otherwise only applied at session build). */
  def applyInjectedFunctions(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
