package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink through Spark's built-in `jdbc` format.
  *
  * Offline the database is embedded Derby (`derby*.jar` ships in
  * /opt/spark/jars), which lives inside the driver JVM — the right
  * stand-in for the reference's "export a mart to an RDBMS" edge
  * (reference: src/data/gold.py writes summary marts downstream
  * systems read). In a cluster deployment the SAME calls point at
  * Postgres/MySQL by swapping the URL: nothing here is Derby-specific
  * except the driver class default.
  *
  * Scale shape: reads are partitioned (`partitionColumn` + bounds →
  * one executor task per slice, each issuing a range-predicated
  * SELECT), so a large table scans in parallel instead of through one
  * connection; Spark pushes filters and column pruning into the remote
  * query. Writes fan out one connection per partition — `numPartitions`
  * caps the connection count so a 1000-task stage cannot open 1000
  * sessions against the database.
  */
object JdbcIO {

  /** Embedded-Derby URL for a database directory (created on demand). */
  def derbyUrl(dbDir: String): String = {
    // Keep Derby's log out of the repo root (its default is user.dir).
    System.setProperty("derby.stream.error.file", "target/tmp/derby.log")
    s"jdbc:derby:$dbDir;create=true"
  }

  def write(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Overwrite,
      maxConnections: Int = 4): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("numPartitions", maxConnections)
      .mode(mode)
      .save()

  /** Single-connection read — schema discovery plus one task. Fine for
    * small dims; use [[readPartitioned]] for anything large.
    */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** Range-partitioned parallel read: `numPartitions` tasks, each
    * scanning `[lower, upper)` slices of `partitionColumn` with a
    * pushed-down range predicate.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}
