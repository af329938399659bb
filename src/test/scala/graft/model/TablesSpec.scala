package graft.model

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** R13/D12 CREATE-TABLE mode: the five reference schemas materialize
  * as catalog tables, idempotently (db_model.py:69-80). */
class TablesSpec extends AnyFunSuite with SparkSpec {

  test("createReferenceTables materializes all five reference schemas, idempotently") {
    val loc = Files.createTempDirectory("graft_ddl").toString
    Tables.createReferenceTables(spark, loc)
    Tables.createReferenceTables(spark, loc) // create_all is idempotent
    Tables.referenceSchemas.foreach { case (name, schema) =>
      assert(spark.catalog.tableExists(name), name)
      val got = spark.table(name).schema
      assert(got.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq, name)
      assert(spark.table(name).count() == 0, name)
    }
    // the fact table accepts an append with the declared schema
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq((1L, 7L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), BigDecimal("1.5")))
      .toDF("id", "channel_id", "ts", "value")
      .withColumn("value", col("value").cast("decimal(25,6)"))
      .write.mode("append").saveAsTable("channel_data")
    assert(spark.table("channel_data").count() == 1)
    Tables.referenceSchemas.keys.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }
}
