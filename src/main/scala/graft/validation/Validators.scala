package graft.validation

import graft.core.{Actor, JobContext}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/**
 * Validate a view's schema against a DDL declaration.
 *
 * Reference: validation/SchemaValidator.scala:46-93. Preserved semantics:
 *  - type `match`: names+dataTypes must be equal; `strict` mode compares
 *    positionally, `default` compares name-sorted (:52-71);
 *  - type `adapt`: project to the target schema, filling missing columns
 *    with typed nulls (:73-87);
 *  - action `error` throws, `ignore` warns (:105-107).
 */
class SchemaValidator extends Actor {
  protected var view: String = ""
  protected var ddl: String = ""
  protected var mode: String = "match"    // match | adapt
  protected var matchMode: String = "default" // default | strict
  protected var action: String = "error"  // error | ignore

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    ddl = properties.get("ddlSchemaString").orElse(properties.get("ddlSchemaFile").map(f =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")))
      .getOrElse(throw new IllegalArgumentException("SchemaValidator: ddlSchemaString/ddlSchemaFile required"))
    properties.get("type").foreach { v =>
      require(Seq("match", "adapt").contains(v), s"bad type: $v"); mode = v
    }
    properties.get("mode").foreach { v =>
      require(Seq("default", "strict").contains(v), s"bad mode: $v"); matchMode = v
    }
    properties.get("action").foreach { v =>
      require(Seq("error", "ignore").contains(v), s"bad action: $v"); action = v
    }
  }

  def sourceView(v: String): this.type = { view = v; this }
  def ddlSchemaString(s: String): this.type = { ddl = s; this }
  def validationType(t: String): this.type = { mode = t; this }
  def withMatchMode(m: String): this.type = { matchMode = m; this }
  def onMismatch(a: String): this.type = { action = a; this }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    val target = StructType.fromDDL(ddl)
    mode match {
      case "match" =>
        val actual = df.schema
        val (a, t) =
          if (matchMode == "strict") (actual.fields.toSeq, target.fields.toSeq)
          else (actual.fields.sortBy(_.name).toSeq, target.fields.sortBy(_.name).toSeq)
        val ok = a.length == t.length && a.zip(t).forall { case (x, y) =>
          x.name == y.name && x.dataType == y.dataType
        }
        if (!ok) {
          val msg = s"schema mismatch for view '$view': actual=${actual.toDDL} expected=${target.toDDL}"
          if (action == "error") throw new IllegalStateException(msg)
          else org.apache.log4j.Logger.getLogger(getClass).warn(msg)
        }
        Some(df)
      case "adapt" =>
        // resolve names under the session's case sensitivity — a strict
        // contains() would null out a column differing only by case even
        // though col(name) resolves it fine
        val caseSensitive = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
        def has(name: String): Boolean =
          if (caseSensitive) df.columns.contains(name)
          else df.columns.exists(_.equalsIgnoreCase(name))
        val cols = target.fields.map { f =>
          if (has(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }
        Some(df.select(cols.toSeq: _*))
    }
  }
}

/**
 * Split rows by a validity predicate; invalid rows can fail the run, be
 * staged to a uri, or be dropped. Returns the valid rows.
 *
 * Reference: validation/SqlDataValidator.scala:36-66 (filter + negation
 * :42-46, actions error/staging/ignore :47-58).
 */
class SqlDataValidator extends Actor {
  protected var view: String = ""
  protected var validWhere: Option[String] = None
  protected var invalidWhere: Option[String] = None
  protected var action: String = "error"  // error | staging | ignore
  protected var stagingUri: Option[String] = None
  protected var stagingFormat: String = "csv"

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    view = require_(properties, "view")
    validWhere = properties.get("validWhere")
    invalidWhere = properties.get("invalidWhere")
    require(validWhere.isDefined || invalidWhere.isDefined,
      "SqlDataValidator: one of validWhere/invalidWhere required")
    properties.get("action").foreach { v =>
      require(Seq("error", "staging", "ignore").contains(v), s"bad action: $v"); action = v
    }
    stagingUri = properties.get("stagingUri")
    // action=staging with no uri would silently DISCARD the invalid rows
    // (neither staged nor reported) — a misconfiguration, not a choice
    require(action != "staging" || stagingUri.isDefined,
      "SqlDataValidator: action=staging requires stagingUri")
    properties.get("stagingFormat").foreach { f =>
      require(Seq("csv", "json", "parquet", "avro").contains(f), s"bad staging format: $f")
      stagingFormat = f
    }
  }

  def sourceView(v: String): this.type = { view = v; this }
  def whereValid(p: String): this.type = { validWhere = Some(p); this }
  def whereInvalid(p: String): this.type = { invalidWhere = Some(p); this }
  def onInvalid(a: String): this.type = { action = a; this }
  def stageTo(uri: String, format: String = "csv"): this.type = {
    stagingUri = Some(uri); stagingFormat = format; this
  }

  override def inputViews: Seq[String] = if (view.nonEmpty) Seq(view) else Seq.empty

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    val df = ctx.getView(view)
    val validPred = validWhere.getOrElse(s"not (${invalidWhere.get})")
    // null-safe split: a row where the predicate evaluates to NULL (e.g.
    // `amount > 0` with NULL amount) counts as INVALID, not dropped —
    // coalesce(p, false) makes valid ∪ invalid = all rows.
    val valid = df.filter(s"coalesce(($validPred), false)")
    val invalid = df.filter(s"not coalesce(($validPred), false)")
    action match {
      case "error" =>
        val n = invalid.count()
        if (n > 0) throw new IllegalStateException(
          s"SqlDataValidator: $n invalid row(s) in view '$view' (predicate: $validPred)")
      case "staging" =>
        val uri = stagingUri.getOrElse(throw new IllegalStateException(
          "SqlDataValidator: action=staging requires stagingUri"))
        invalid.write.mode("append").format(stagingFormat)
          .option("header", "true").save(uri)
      case "ignore" => ()
    }
    Some(valid)
  }
}
