package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: specs that
  * read task metrics through a SparkListener must block until the bus
  * has drained before reading their counters — a fixed sleep under-reads
  * under CI load (r12 ADVICE). Lives in the org.apache.spark package
  * solely to reach the private[spark] member; test classpath only.
  */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
