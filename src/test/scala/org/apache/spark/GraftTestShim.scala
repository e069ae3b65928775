package org.apache.spark

/** Test-only access to `private[spark]` internals: listener-counting
  * specs must drain the async listener bus deterministically instead of
  * sleeping past it (the r11 MemoCountSpec flake). */
object GraftTestShim {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
