package graft

import graft.core.{JobContext, PipelineContext}
import graft.source.{BinaryFileReader, FlatFields, FlatFileReader}
import graft.functions.{Decoder, UdfRegistry}

class FlatFileSpec extends SparkSpec {

  private val fixedLines =
    """HDR20240211
      |alice    1         2024-02-11T00:00:011
      |bob      2         2024-02-11T00:05:020
      |carol    3         2024-02-11T00:07:111
      |TRL00003""".stripMargin

  test("positional field spec parsing") {
    val fs = FlatFields.parsePositional("user:1-9 string, event:10-10 long, ts:20-19 string, flag:39-1 int")
    fs.map(_.name) shouldBe Seq("user", "event", "ts", "flag")
    fs(1).start shouldBe 10
    fs(1).len shouldBe 10
    fs(1).dataType shouldBe "long"
  }

  test("delimited field spec fills gaps with dummies") {
    val fs = FlatFields.parseDelimited("user:0 string, event:2 long")
    fs.map(_.name) shouldBe Seq("user", "__dummy_1__", "event")
  }

  test("fixed-width read with N-rows header and trailer views") {
    implicit val s = spark
    val dir = tmpDir("flat")
    writeFile(dir, "train.txt", fixedLines)
    val ctx = new JobContext(PipelineContext())
    val reader = new FlatFileReader()
      .fileUri(s"$dir/train.txt").bodyFormat("fixed-length")
      .positionalFields("user:1-9 string, event:10-10 long, ts:20-19 string, flag:39-1 int")
      .header(1, "hdr_view").trailer(1, "trl_view")
    val out = reader.run(ctx).get
    reader.extraViews.foreach { case (n, df, g) => ctx.promoteView(n, df, g) }
    out.count() shouldBe 3
    out.columns.toSeq shouldBe Seq("user", "event", "ts", "flag")
    out.filter("trim(user) = 'alice'").select("event").collect().head.getLong(0) shouldBe 1L
    spark.table("hdr_view").count() shouldBe 1
    spark.table("trl_view").count() shouldBe 1
    spark.table("hdr_view").select("__value_").collect().head.getString(0) shouldBe "HDR20240211"
  }

  test("regex header extraction + row filter") {
    implicit val s = spark
    val dir = tmpDir("flat2")
    writeFile(dir, "t.txt", fixedLines)
    val ctx = new JobContext(PipelineContext())
    val reader = new FlatFileReader()
      .fileUri(s"$dir/t.txt").bodyFormat("fixed-length")
      .positionalFields("user:1-9 string, event:10-10 long")
      .headerByRegex("^HDR.*", "h2").trailerByRegex("^TRL.*", "t2")
      .filterRows("event >= 2")
    val out = reader.run(ctx).get
    out.count() shouldBe 2
  }

  test("delimited read with dummy-column drop and row numbers") {
    implicit val s = spark
    val dir = tmpDir("flat3")
    writeFile(dir, "d.csv", "alice,x,1\nbob,y,2\ncarol,z,3")
    val ctx = new JobContext(PipelineContext())
    val out = new FlatFileReader()
      .fileUri(s"$dir/d.csv").bodyFormat("delimited")
      .delimitedFields("user:0 string, event:2 long")
      .rowNumberField("row_no")
      .run(ctx).get
    out.columns.toSeq shouldBe Seq("user", "event", "row_no")
    out.count() shouldBe 3
    out.filter("user = 'bob'").select("row_no").collect().head.getLong(0) shouldBe 2L
  }

  test("row numbering is correct when one file is read as several splits") {
    implicit val s = spark
    val dir = tmpDir("flatsplit")
    val n = 20000
    // ~340 KB file; 32 KB split size forces ~10 splits of the ONE file —
    // the per-file row numbers must still follow byte order
    writeFile(dir, "big.txt", (1 to n).map(i => f"line$i%012d").mkString("\n"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "32768")
    try {
      // the scan itself must really split the file (the output frame is
      // post-window-shuffle, so check the raw read)
      spark.read.text(s"$dir/big.txt").rdd.getNumPartitions should be > 4
      val ctx = new JobContext(PipelineContext())
      val out = new FlatFileReader()
        .fileUri(s"$dir/big.txt").bodyFormat("delimited")
        .delimitedFields("line:0 string")
        .rowNumberField("row_no")
        .run(ctx).get
      val rows = out.collect().map(r => r.getString(0) -> r.getLong(1))
      rows.length shouldBe n
      rows.foreach { case (line, no) => line shouldBe f"line$no%012d" }
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("binary reader with fixed record length + field transformations") {
    implicit val s = spark
    val dir = tmpDir("bin")
    // 3 records of 8 bytes each: 4-char name + 4-digit number
    val payload = "aaaa0001bbbb0002cccc0003".getBytes("ISO-8859-1")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "r.bin"), payload)
    UdfRegistry.registerSystemUdfs(spark)
    val ctx = new JobContext(PipelineContext())
    val out = new BinaryFileReader()
      .fileUri(s"$dir/r.bin").withRecordLength(8)
      .withFieldTransformation("name", "bytes_to_string(substring($., 1, 4), 'ISO-8859-1')")
      .withFieldTransformation("num", "cast(bytes_to_string(substring($., 5, 4), 'ISO-8859-1') as int)")
      .run(ctx).get
    out.count() shouldBe 3
    out.filter("name = 'bbbb'").select("num").collect().head.getInt(0) shouldBe 2
  }

  test("COMP-3 packed decimal decode") {
    // 12345 positive: nibbles 1 2 3 4 5 C
    val pos = Array[Byte](0x12, 0x34, 0x5c)
    Decoder.com3ToInt(pos) shouldBe 12345
    Decoder.com3ToDouble(pos, 2) shouldBe 123.45
    // -987: nibbles 9 8 7 D
    val neg = Array[Byte](0x98.toByte, 0x7d)
    Decoder.com3ToInt(neg) shouldBe -987
  }

  test("COMP-3 properties: round-trip, sign nibbles, padding, scale (ScalaCheck)") {
    // Property coverage beyond the two worked examples above: a test-side
    // encoder (digits -> packed nibbles + sign, written from the same
    // public format description) round-trips through the decoder across
    // generated magnitudes, every legal sign nibble, leading-zero byte
    // padding, and digit-count parity (even digit counts force a pad
    // nibble — the byte-alignment boundary).
    import org.scalacheck.Gen
    def encode(n: Long, signNibble: Int): Array[Byte] = {
      val digits = math.abs(n).toString
      val padded = if (digits.length % 2 == 0) "0" + digits else digits
      val nibbles = padded.map(_ - '0').toIndexedSeq :+ signNibble
      nibbles.grouped(2).map { case Seq(h, l) => ((h << 4) | l).toByte }.toArray
    }
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      Iterator.continually(g.sample).flatten.take(n).toSeq
    val magnitudes = Gen.oneOf(
      Gen.choose(0L, 9L),                       // single digit (odd count, no pad)
      Gen.choose(10L, 99L),                     // two digits (pad nibble path)
      Gen.choose(100L, 2147483647L),            // full int range
      Gen.oneOf(0L, 9L, 10L, 99L, 100L, 999L,  // nibble-boundary magnitudes
        1000L, 2147483647L))
    val posNibbles = Seq(0x0a, 0x0c, 0x0e, 0x0f)
    val negNibbles = Seq(0x0b, 0x0d)
    for (m <- samples(magnitudes, 200)) {
      for (sn <- posNibbles) Decoder.com3ToInt(encode(m, sn)) shouldBe m.toInt
      for (sn <- negNibbles) Decoder.com3ToInt(encode(m, sn)) shouldBe -m.toInt
      // leading 0x00 bytes are zero digits: value-invariant
      val padded = Array[Byte](0x00, 0x00) ++ encode(m, 0x0c)
      Decoder.com3ToInt(padded) shouldBe m.toInt
      // scale moves the point exactly as an independent decimal would
      for (s <- 0 to 4) {
        val expected = BigDecimal(m).bigDecimal.movePointLeft(s).doubleValue
        Decoder.com3ToDouble(encode(m, 0x0c), s) shouldBe expected +- (math.ulp(expected) * 2)
      }
    }
    // invalid nibbles fail fast, not garble: digit nibble > 9 in any
    // digit position; digit nibble (0-9) where the sign must sit
    for (badDigit <- 0x0a to 0x0f) {
      val hi = Array[Byte](((badDigit << 4) | 0x1).toByte, 0x2c) // bad high nibble
      an[IllegalArgumentException] should be thrownBy Decoder.com3ToInt(hi)
      val lo = Array[Byte](((0x1 << 4) | badDigit).toByte, 0x2c) // bad low nibble (non-final byte)
      an[IllegalArgumentException] should be thrownBy Decoder.com3ToInt(lo)
    }
    for (badSign <- 0x0 to 0x9) {
      val b = Array[Byte](0x12, ((0x3 << 4) | badSign).toByte)
      an[IllegalArgumentException] should be thrownBy Decoder.com3ToInt(b)
    }
  }

  test("binary_split splits on multi-byte delimiter") {
    val data = "ab||cd||ef".getBytes("ISO-8859-1")
    val parts = Decoder.binarySplit(data, "||".getBytes("ISO-8859-1"))
    parts.map(new String(_, "ISO-8859-1")).toSeq shouldBe Seq("ab", "cd", "ef")
    Decoder.binarySplit("abc".getBytes, Array.empty[Byte]).length shouldBe 1
  }

  test("bytes_to_hex") {
    Decoder.bytesToHex(Array[Byte](0x0f, 0xa0.toByte)) shouldBe "0fa0"
  }
}
