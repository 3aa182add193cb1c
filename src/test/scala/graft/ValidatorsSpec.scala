package graft

import graft.core.{JobContext, PipelineContext}
import graft.validation.{SchemaValidator, SqlDataValidator}

class ValidatorsSpec extends SparkSpec {

  test("schema match passes on equal schemas, name-order-insensitive by default") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq((1, "a")).toDF("id", "name").createOrReplaceTempView("sv1")
    new SchemaValidator().sourceView("sv1")
      .ddlSchemaString("name string, id int")
      .run(ctx).get.count() shouldBe 1
  }

  test("schema match strict is positional and fails on reorder") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq((1, "a")).toDF("id", "name").createOrReplaceTempView("sv2")
    an[IllegalStateException] should be thrownBy {
      new SchemaValidator().sourceView("sv2")
        .ddlSchemaString("name string, id int").withMatchMode("strict")
        .run(ctx)
    }
  }

  test("schema adapt projects and null-fills missing columns") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq((1, "a")).toDF("id", "name").createOrReplaceTempView("sv3")
    val out = new SchemaValidator().sourceView("sv3")
      .ddlSchemaString("id long, extra double").validationType("adapt")
      .run(ctx).get
    out.schema.map(f => (f.name, f.dataType.simpleString)) shouldBe
      Seq(("id", "bigint"), ("extra", "double"))
    out.collect().head.isNullAt(1) shouldBe true
  }

  test("data validator: error action throws when invalid rows exist") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq(1, 2, -3).toDF("v").createOrReplaceTempView("dv1")
    val e = intercept[IllegalStateException] {
      new SqlDataValidator().sourceView("dv1").whereValid("v > 0").run(ctx)
    }
    e.getMessage should include("1 invalid")
  }

  test("data validator: ignore action returns only valid rows") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    Seq(1, 2, -3).toDF("v").createOrReplaceTempView("dv2")
    val out = new SqlDataValidator().sourceView("dv2")
      .whereInvalid("v < 0").onInvalid("ignore").run(ctx).get
    out.collect().map(_.getInt(0)).sorted.toSeq shouldBe Seq(1, 2)
  }

  test("data validator: staging action dumps invalid rows") {
    implicit val s = spark
    import spark.implicits._
    val ctx = new JobContext(PipelineContext())
    val stage = tmpDir("stage")
    Seq(1, -2, -3).toDF("v").createOrReplaceTempView("dv3")
    val out = new SqlDataValidator().sourceView("dv3")
      .whereValid("v > 0").onInvalid("staging").stageTo(s"$stage/bad", "parquet")
      .run(ctx).get
    out.count() shouldBe 1
    spark.read.parquet(s"$stage/bad").count() shouldBe 2
  }
}
