package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Collision-free temp-view scoping for the few declared queries that go
  * through `spark.sql` over registered frames. A FIXED view name is
  * session-global mutable state: two concurrent queries in one session
  * would overwrite each other's registration (the r11 q16 advisory).
  * Here every registration gets a random suffix and is dropped as soon
  * as the body returns — analysis has already inlined the view into the
  * returned plan, so the drop leaves no catalog trace and the plan stays
  * valid. */
object Views {
  def withTemp(spark: SparkSession)(dfs: (String, DataFrame)*)(
      body: Map[String, String] => DataFrame): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val names = dfs.map { case (prefix, df) =>
      val n = s"${prefix}_$tag"
      df.createOrReplaceTempView(n)
      prefix -> n
    }.toMap
    try body(names)
    finally names.values.foreach(spark.catalog.dropTempView)
  }
}
