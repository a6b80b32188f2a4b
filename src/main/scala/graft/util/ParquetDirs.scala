package graft.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared helper for parquet-backed metadata/log dirs that may not exist
  * yet: read with the declared schema, or an empty DataFrame of that
  * schema before the first write. */
object ParquetDirs {
  def readOrEmpty(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val f = new java.io.File(dir)
    val hasData = f.exists && f.listFiles != null &&
      f.listFiles.exists(_.getName.endsWith(".parquet"))
    if (hasData) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }
}
