package org.apache.spark.graftbridge

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Bridge to `org.apache.spark.util.SerializableConfiguration`
  * (`private[spark]`): the supported way to hand the DRIVER's merged
  * Hadoop configuration — core-site/hdfs-site XML plus every
  * `spark.hadoop.*` override SparkHadoopUtil folded in — to executor
  * code. Building a `new Configuration()` on the executor instead sees
  * only classpath XML, so a cluster whose default FS or credentials are
  * configured via Spark conf would resolve a DIFFERENT filesystem on
  * executors than on the driver (the r9-review finding on
  * binaryFileScan). Same package-placement pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]. */
object HadoopConfBridge {
  /** Broadcast the driver's Hadoop conf once; `.value.value` on the
    * executor yields a Configuration (Configuration itself is not
    * Serializable — the wrapper write/reads it as Hadoop Writable). */
  def broadcast(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  def conf(b: Broadcast[SerializableConfiguration]): org.apache.hadoop.conf.Configuration =
    b.value.value
}
