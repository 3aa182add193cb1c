package graft

import graft.core.{JobContext, PipelineContext}
import graft.sql.{SqlBase, SqlWriter}

class SqlBaseSpec extends SparkSpec {

  test("stripComments removes -- and /*..*/ but keeps hints and literals") {
    SqlBase.stripComments("select 1 -- trailing\nfrom t") shouldBe "select 1 \nfrom t"
    SqlBase.stripComments("select /* gone */ 1") shouldBe "select   1"
    SqlBase.stripComments("select /*+ BROADCAST(t) */ 1") shouldBe "select /*+ BROADCAST(t) */ 1"
    SqlBase.stripComments("select '--not a comment' from t") shouldBe "select '--not a comment' from t"
    SqlBase.stripComments("select '/*lit*/' from t") shouldBe "select '/*lit*/' from t"
  }

  test("splitStatements honors quotes") {
    SqlBase.splitStatements("select 1; select 2") shouldBe Seq("select 1", "select 2")
    SqlBase.splitStatements("select 'a;b'; select 2") shouldBe Seq("select 'a;b'", "select 2")
  }

  test("classify set / setrun / plain sql") {
    SqlBase.classify("set a = 1") shouldBe a[SqlBase.SetStatement]
    SqlBase.classify("setrun a = (select 1)") shouldBe a[SqlBase.SetRunStatement]
    SqlBase.classify("select 1") shouldBe a[SqlBase.SqlStatement]
    // names may be dotted
    val s = SqlBase.classify("set my.var = x").asInstanceOf[SqlBase.SetStatement]
    s.name shouldBe "my.var"
  }

  test("isQuery / isDml guards") {
    SqlBase.isQuery("select 1") shouldBe true
    SqlBase.isQuery("with t as (select 1) select * from t") shouldBe true
    SqlBase.isQuery("insert into t values (1)") shouldBe false
    SqlBase.isDml("insert into t values (1)") shouldBe true
    SqlBase.isDml("merge into t using s on 1=1 when matched then delete") shouldBe true
    SqlBase.isDml("select 1") shouldBe false
  }

  test("set is a lazy textual macro, setrun evaluates eagerly") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    spark.range(10).toDF("n").createOrReplaceTempView("nums")
    val out = SqlBase.execute(
      """set tbl = nums;
        |setrun maxn = (select max(n) from nums);
        |select n from ${tbl} where n = ${maxn}""".stripMargin, ctx)
    out.get.collect().map(_.getLong(0)).toSeq shouldBe Seq(9L)
    ctx.sqlVariables("tbl") shouldBe "nums"
    ctx.sqlVariables("maxn") shouldBe "9"
  }

  test("set variable can hold a relation alias used in a later join") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    spark.range(5).toDF("k").createOrReplaceTempView("left_t")
    val out = SqlBase.execute(
      """set top = (select k from left_t where k >= 3);
        |select count(*) as c from ${top} t""".stripMargin, ctx)
    out.get.collect().head.getLong(0) shouldBe 2L
  }

  test("referencedViews finds relations through CTEs") {
    implicit val s = spark
    val views = SqlBase.referencedViews(
      "with x as (select * from t1) select * from x join t2 on 1=1", Map.empty)
    views should contain allOf ("t1", "t2")
  }

  test("SqlWriter rejects non-DML") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    val w = new SqlWriter().sqlString("select 1")
    an[IllegalArgumentException] should be thrownBy w.run(ctx)
  }

  test("variable precedence: sql variables shadow pipeline variables") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    ctx.setVariable("v", "100")
    val out = SqlBase.execute("set v = 7; select ${v} as x", ctx)
    out.get.collect().head.get(0).toString shouldBe "7"
  }

  test("backslash-escaped quotes inside literals survive splitting and stripping") {
    // Spark's default parser treats \' inside a '-literal as an escaped
    // quote; the ; and -- inside this ONE literal are content, not syntax
    val sql = """SELECT 'it\'s; fine -- not a comment' AS s"""
    SqlBase.splitStatements(sql) shouldBe Seq(sql)
    SqlBase.stripComments(sql) shouldBe sql
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    SqlBase.execute(sql, ctx).get.collect().head.getString(0) shouldBe "it's; fine -- not a comment"
  }

  test("setrun strips only a genuinely wrapping paren pair") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    // two adjacent groups: stripping first/last chars would yield
    // `select 1) + (select 2` — must stay intact and splice as text
    val out = SqlBase.execute(
      "setrun x = (select 1) + (select 2); select ${x} as v", ctx)
    out.get.collect().head.get(0).toString shouldBe "3"
    // a real wrapping pair still evaluates eagerly to a scalar
    val out2 = SqlBase.execute("setrun y = (select 40 + 2); select ${y} as v", ctx)
    out2.get.collect().head.get(0).toString shouldBe "42"
  }

  test("SqlReader/SqlWriter gates classify statements supplied via variables") {
    implicit val s = spark
    val ctx = new JobContext(PipelineContext())
    ctx.setVariable("stmt", "select 5 as v")
    val r = new graft.sql.SqlReader().sqlString("${stmt}")
    r.run(ctx).get.collect().head.get(0).toString shouldBe "5"
    // and still rejects once resolved to non-query
    ctx.setVariable("bad", "drop table nope")
    an[IllegalArgumentException] should be thrownBy
      new graft.sql.SqlReader().sqlString("${bad}").run(ctx)
  }
}
