package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` InternalRow-based DataFrame creation
  * (classic.SparkSession.internalCreateDataFrame): lets the
  * CollectLeft build assemble its broadcast-backed build-side frame
  * from the UnsafeRows `executeCollect()` returns, skipping the
  * CatalystTypeConverters round-trip that `df.collect()` +
  * `createDataFrame` would run per field per row (driver-serial on
  * the build side). Same tier as [[GraftColumnBridge]]. */
object GraftRowBridge {
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
