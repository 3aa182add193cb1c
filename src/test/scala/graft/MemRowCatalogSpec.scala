package graft

import graft.source.MemRowCatalog

/** Spark's own row-level-operation rewrites (MERGE INTO / UPDATE / DELETE)
 *  executed end-to-end against the copy-on-write MemRowCatalog. */
class MemRowCatalogSpec extends SparkSpec {

  private def setupCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.memtest", classOf[MemRowCatalog].getName)

  private def freshTable(name: String): String = {
    setupCatalog()
    val t = s"memtest.db.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, status STRING, amount BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'open', 10), (2, 'open', 20), (3, 'closed', 30)")
    t
  }

  private def contents(t: String): Seq[(Long, String, Long)] =
    spark.sql(s"SELECT * FROM $t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

  test("INSERT INTO appends; INSERT OVERWRITE truncates") {
    val t = freshTable("ins")
    spark.sql(s"INSERT INTO $t VALUES (4, 'open', 40)")
    contents(t).map(_._1) shouldBe Seq(1L, 2L, 3L, 4L)
    spark.sql(s"INSERT OVERWRITE $t VALUES (9, 'open', 90)")
    contents(t) shouldBe Seq((9L, "open", 90L))
  }

  test("DELETE FROM removes matching rows only") {
    val t = freshTable("del")
    spark.sql(s"DELETE FROM $t WHERE status = 'closed'")
    contents(t) shouldBe Seq((1L, "open", 10L), (2L, "open", 20L))
  }

  test("UPDATE rewrites matching rows in place") {
    val t = freshTable("upd")
    spark.sql(s"UPDATE $t SET amount = amount + 100 WHERE status = 'open'")
    contents(t) shouldBe Seq((1L, "open", 110L), (2L, "open", 120L), (3L, "closed", 30L))
  }

  test("MERGE INTO: matched update, not-matched insert, matched delete") {
    val t = freshTable("mrg")
    spark.sql("SELECT * FROM VALUES (2, 55L), (3, 0L), (5, 50L) AS src(id, new_amount)")
      .createOrReplaceTempView("mrg_src")
    spark.sql(
      s"""MERGE INTO $t tgt USING mrg_src src ON tgt.id = src.id
         |WHEN MATCHED AND src.new_amount = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET amount = src.new_amount
         |WHEN NOT MATCHED THEN INSERT (id, status, amount) VALUES (src.id, 'merged', src.new_amount)
         |""".stripMargin)
    contents(t) shouldBe Seq(
      (1L, "open", 10L),     // untouched
      (2L, "open", 55L),     // matched update
      (5L, "merged", 50L))   // not-matched insert; 3 deleted
  }

  test("renameTable enforces the TableCatalog contract") {
    import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val t = freshTable("ren")
    val cat = spark.sessionState.catalogManager.catalog("memtest").asInstanceOf[TableCatalog]
    def id(name: String) = Identifier.of(Array("db"), name)
    // happy path moves the data
    cat.renameTable(id("ren"), id("ren2"))
    contents("memtest.db.ren2").map(_._1) shouldBe Seq(1L, 2L, 3L)
    // missing source must raise, not silently report success
    intercept[NoSuchTableException] { cat.renameTable(id("ren"), id("ren3")) }
    // existing target must raise instead of clobbering it — the target is
    // seeded with a row the source lacks, so a clobber-then-throw
    // implementation can't sneak past the contents assertions
    freshTable("ren_tgt")
    spark.sql("INSERT INTO memtest.db.ren_tgt VALUES (7, 'tgt-only', 70)")
    intercept[TableAlreadyExistsException] { cat.renameTable(id("ren2"), id("ren_tgt")) }
    contents("memtest.db.ren_tgt").map(_._1) shouldBe Seq(1L, 2L, 3L, 7L)
    contents("memtest.db.ren2").map(_._1) shouldBe Seq(1L, 2L, 3L)
    spark.sql(s"DROP TABLE memtest.db.ren2"); spark.sql(s"DROP TABLE memtest.db.ren_tgt")
  }

  test("DML round-trip composes: merge then delete then final state") {
    val t = freshTable("comp")
    spark.sql("SELECT * FROM VALUES (1, 99L), (4, 44L) AS s(id, a)").createOrReplaceTempView("comp_src")
    spark.sql(
      s"""MERGE INTO $t tgt USING comp_src s ON tgt.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.a
         |WHEN NOT MATCHED THEN INSERT (id, status, amount) VALUES (s.id, 'new', s.a)""".stripMargin)
    spark.sql(s"DELETE FROM $t WHERE amount >= 99")
    contents(t) shouldBe Seq((2L, "open", 20L), (3L, "closed", 30L), (4L, "new", 44L))
  }
}
