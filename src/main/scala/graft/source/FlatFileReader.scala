package graft.source

import graft.core.{Actor, JobContext}
import graft.utils.DataframeHelper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Field specs for flat files (reference: common/FlatReadActor.scala).
 *  - positional: `name:start-len type` (1-based start), parsed like
 *    FlatReadActor.parsePositionalFields (:98-114);
 *  - delimited: `name:index type` with gaps filled as `__dummy_N__ string`,
 *    like parseDelimitedFields (:124-140).
 */
object FlatFields {
  final case class Positional(name: String, start: Int, len: Int, dataType: String)
  final case class Delimited(name: String, index: Int, dataType: String)

  def parsePositional(spec: String): Seq[Positional] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).map { f =>
      val m = """([\w]+):(\d+)-(\d+)\s+(\w+)""".r
      f match {
        case m(name, start, len, t) => Positional(name, start.toInt, len.toInt, t)
        case _ => throw new IllegalArgumentException(s"bad positional field spec: '$f'")
      }
    }.toSeq

  def parseDelimited(spec: String): Seq[Delimited] = {
    val fields = spec.split(",").map(_.trim).filter(_.nonEmpty).map { f =>
      val m = """([\w]+):(\d+)\s+(\w+)""".r
      f match {
        case m(name, idx, t) => Delimited(name, idx.toInt, t)
        case _ => throw new IllegalArgumentException(s"bad delimited field spec: '$f'")
      }
    }.toSeq
    // fill index gaps with dummy columns (reference: FlatFileReader.scala:299-303)
    val maxIdx = fields.map(_.index).max
    (0 to maxIdx).map { i =>
      fields.find(_.index == i).getOrElse(Delimited(s"__dummy_${i}__", i, "string"))
    }
  }

  /** Column projection for positional fields over a raw-line column. */
  def positionalCols(raw: Column, fields: Seq[Positional]): Seq[Column] =
    fields.map(f => raw.substr(f.start, f.len).cast(f.dataType).as(f.name))
}

/**
 * Text files as structured rows, with three body formats — `text` (single
 * `__value_` column), `delimited`, `fixed-length` — plus header/trailer
 * extraction (by row count, regex, or SQL expression) into separate views,
 * an optional row-number column, and row filtering.
 *
 * Reference: source/FlatFileReader.scala (body split :208-280, N-rows
 * header/trailer via per-file min/max seq-no join :211-238, regex :240-255,
 * expr :257-272; delimited formalization via from_csv :294-309; fixed-width
 * via substr+cast :310-317; extra views :194-203; row numbering :189).
 *
 * Scale note: the N-rows header/trailer path needs a per-file row sequence;
 * we number rows per file partition-parallel (window by file name over
 * monotonically_increasing_id) — no global sort, so it scales with file
 * count × file size like the reference.
 */
class FlatFileReader extends Actor {
  protected var uris: Seq[String] = Seq.empty
  protected var format: String = "text"               // text | delimited | fixed-length
  protected var delimiter: String = ","
  protected var positionalSpec: Option[String] = None
  protected var delimitedSpec: Option[String] = None
  protected var ddlSchema: Option[String] = None
  // header/trailer: N rows | regex | SQL expr
  protected var headerRows: Int = 0
  protected var trailerRows: Int = 0
  protected var headerRegex: Option[String] = None
  protected var trailerRegex: Option[String] = None
  protected var headerExpr: Option[String] = None
  protected var trailerExpr: Option[String] = None
  protected var headerView: Option[String] = None
  protected var trailerView: Option[String] = None
  protected var rowNoColumn: Option[String] = None
  protected var rowFilter: Option[String] = None
  protected var readOptions: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    uris = require_(properties, "fileUri").split(",").toSeq
    properties.get("format").foreach { f =>
      require(Seq("text", "delimited", "fixed-length").contains(f), s"bad flat format: $f")
      format = f
    }
    properties.get("delimiter").foreach(delimiter = _)
    positionalSpec = properties.get("positionalFields")
    delimitedSpec = properties.get("delimitedFields")
    ddlSchema = properties.get("ddlSchemaString")
    properties.get("header.rows").foreach(v => headerRows = v.toInt)
    properties.get("trailer.rows").foreach(v => trailerRows = v.toInt)
    headerRegex = properties.get("header.regex")
    trailerRegex = properties.get("trailer.regex")
    headerExpr = properties.get("header.expr")
    trailerExpr = properties.get("trailer.expr")
    headerView = properties.get("header.view")
    trailerView = properties.get("trailer.view")
    rowNoColumn = properties.get("rowNoField")
    rowFilter = properties.get("filter")
    readOptions ++= properties.collect { case (k, v) if k.startsWith("options.") => k.stripPrefix("options.") -> v }
  }

  def fileUri(u: String*): this.type = { uris = u; this }
  def bodyFormat(f: String): this.type = { format = f; this }
  def withDelimiter(d: String): this.type = { delimiter = d; this }
  def positionalFields(s: String): this.type = { positionalSpec = Some(s); this }
  def delimitedFields(s: String): this.type = { delimitedSpec = Some(s); this }
  def ddlSchemaString(s: String): this.type = { ddlSchema = Some(s); this }
  def header(rows: Int, view: String): this.type = { headerRows = rows; headerView = Some(view); this }
  def trailer(rows: Int, view: String): this.type = { trailerRows = rows; trailerView = Some(view); this }
  def headerByRegex(re: String, view: String): this.type = { headerRegex = Some(re); headerView = Some(view); this }
  def trailerByRegex(re: String, view: String): this.type = { trailerRegex = Some(re); trailerView = Some(view); this }
  def headerByExpr(e: String, view: String): this.type = { headerExpr = Some(e); headerView = Some(view); this }
  def trailerByExpr(e: String, view: String): this.type = { trailerExpr = Some(e); trailerView = Some(view); this }
  def rowNumberField(c: String): this.type = { rowNoColumn = Some(c); this }
  def filterRows(predicate: String): this.type = { rowFilter = Some(predicate); this }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    require(uris.nonEmpty, "FlatFileReader: fileUri is required")
    val raw0 = spark.read.options(readOptions).text(uris: _*)
      .withColumnRenamed("value", "__value_")
      .withColumn("__file_", input_file_name())

    // per-file row sequence for N-rows header/trailer and row numbering
    val needSeq = headerRows > 0 || trailerRows > 0 || rowNoColumn.isDefined
    val raw =
      if (!needSeq) raw0
      else {
        import org.apache.spark.sql.expressions.Window
        // explicit in-file ordering: a large file is read as several splits,
        // and relying on monotonically_increasing_id alone would assume
        // Spark packs splits in offset order (an implementation detail).
        // `_metadata.file_block_start` is the split's byte offset — ordering
        // by (block_start, id) is correct whatever order splits landed in.
        val w = Window.partitionBy(col("__file_"))
          .orderBy(col("__block_start_"), monotonically_increasing_id())
        val withNo = raw0
          .withColumn("__block_start_", col("_metadata.file_block_start"))
          .withColumn("__row_no_", row_number().over(w).cast("long"))
          .drop("__block_start_")
        if (trailerRows > 0) {
          val counts = withNo.groupBy(col("__file_")).agg(max(col("__row_no_")).as("__file_rows_"))
          withNo.join(broadcast(counts), "__file_")
        } else withNo
      }

    // split off header/trailer rows
    var (body, header, trailer) = (raw, raw.limit(0), raw.limit(0))
    if (headerRows > 0) {
      header = raw.filter(col("__row_no_") <= headerRows)
      body = body.filter(col("__row_no_") > headerRows)
    }
    if (trailerRows > 0) {
      trailer = raw.filter(col("__row_no_") > col("__file_rows_") - trailerRows)
      body = body.filter(col("__row_no_") <= col("__file_rows_") - trailerRows)
    }
    headerRegex.foreach { re =>
      header = body.filter(col("__value_").rlike(re))
      body = body.filter(!col("__value_").rlike(re))
    }
    trailerRegex.foreach { re =>
      trailer = body.filter(col("__value_").rlike(re))
      body = body.filter(!col("__value_").rlike(re))
    }
    headerExpr.foreach { e =>
      header = body.filter(expr(e))
      body = body.filter(!expr(e))
    }
    trailerExpr.foreach { e =>
      trailer = body.filter(expr(e))
      body = body.filter(!expr(e))
    }
    // header/trailer views stay raw (`__value_`): their layout is usually
    // different from the body's field spec (reference keeps them as
    // separate unformalized views, FlatFileReader.scala:194-203)
    headerView.foreach(v => registerView(v, header.select(col("__value_"))))
    trailerView.foreach(v => registerView(v, trailer.select(col("__value_"))))

    var out = formalize(body)
    rowNoColumn.foreach { c => out = out.withColumn(c, col("__row_no_")) }
    out = out.drop("__file_", "__row_no_", "__file_rows_")
    rowFilter.foreach { p => out = out.filter(p) }
    Some(out)
  }

  /** Turn raw `__value_` lines into typed columns per the body format. */
  private def formalize(df: DataFrame): DataFrame = format match {
    case "text" => df
    case "fixed-length" =>
      val fields = FlatFields.parsePositional(positionalSpec.getOrElse(
        throw new IllegalArgumentException("fixed-length format requires positionalFields")))
      val keep = df.columns.filter(c => c == "__file_" || c == "__row_no_" || c == "__file_rows_").map(col)
      df.select(FlatFields.positionalCols(col("__value_"), fields) ++ keep: _*)
    case "delimited" =>
      // from_csv keeps quoting/escaping semantics consistent with Spark CSV
      // (reference formalizes the same way, FlatFileReader.scala:294-309)
      val fields = delimitedSpec.map(FlatFields.parseDelimited)
      val schemaDdl = fields match {
        case Some(fs) => fs.map(f => s"${f.name} ${f.dataType}").mkString(", ")
        case None => ddlSchema.getOrElse(
          throw new IllegalArgumentException("delimited format requires delimitedFields or ddlSchemaString"))
      }
      val parsed = df.withColumn("__parsed_",
        from_csv(col("__value_"), StructType.fromDDL(schemaDdl), Map("sep" -> delimiter)))
      val dataCols = StructType.fromDDL(schemaDdl).fieldNames
        .filterNot(_.matches("__dummy_\\d+__"))
        .map(n => col(s"__parsed_.$n").as(n))
      val keep = df.columns.filter(c => c == "__file_" || c == "__row_no_" || c == "__file_rows_").map(col)
      parsed.select(dataCols.toSeq ++ keep: _*)
  }
}

/**
 * Binary file reader: fixed `recordLength` via binaryRecords, else whole
 * files via the binaryFile source; optional per-field SQL transformations
 * with a `$.` placeholder for the raw record column.
 *
 * Reference: source/BinaryFileReader.scala (record split :52-62, row
 * transformation :64-68, field transformation map w/ `default` key :127-142).
 */
class BinaryFileReader extends Actor {
  protected var uris: Seq[String] = Seq.empty
  protected var recordLength: Option[Int] = None
  protected var rowTransformation: Option[String] = None
  protected var fieldTransformations: Map[String, String] = Map.empty

  override def init(properties: Map[String, String])(implicit spark: SparkSession): Unit = {
    uris = require_(properties, "fileUri").split(",").toSeq
    recordLength = properties.get("recordLength").map(_.toInt)
    rowTransformation = properties.get("rowTransformation")
    fieldTransformations = properties.collect {
      case (k, v) if k.startsWith("field.") => k.stripPrefix("field.") -> v
    }
  }

  def fileUri(u: String*): this.type = { uris = u; this }
  def withRecordLength(n: Int): this.type = { recordLength = Some(n); this }
  def withRowTransformation(sql: String): this.type = { rowTransformation = Some(sql); this }
  def withFieldTransformation(name: String, sql: String): this.type = {
    fieldTransformations += (name -> sql); this
  }

  override def run(ctx: JobContext)(implicit spark: SparkSession): Option[DataFrame] = {
    require(uris.nonEmpty, "BinaryFileReader: fileUri is required")
    val records: DataFrame = recordLength match {
      case Some(n) =>
        val rdd = uris.map(u => spark.sparkContext.binaryRecords(u, n)).reduce(_ union _)
        import spark.implicits._
        rdd.toDF("__record_")
      case None =>
        spark.read.format("binaryFile").load(uris: _*)
          .select(col("content").as("__record_"), col("path").as("__file_"))
    }
    // `$.` placeholder refers to the raw record column
    val transformed = rowTransformation match {
      case Some(sql) => records.withColumn("__record_", expr(sql.replace("$.", "__record_")))
      case None => records
    }
    val out =
      if (fieldTransformations.isEmpty) transformed
      else {
        // name-sorted: Map iteration order is arbitrary past 4 entries and
        // the output column order must be deterministic
        val cols = fieldTransformations.toSeq.sortBy(_._1).map { case (name, sql) =>
          expr(sql.replace("$.", "__record_")).as(name)
        }
        transformed.select(cols: _*)
      }
    Some(out)
  }
}
