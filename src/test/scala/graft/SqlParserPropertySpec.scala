package graft

import graft.sql.SqlBase
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Property tests for the hand-rolled SQL script parsing — the code most
 * exposed to adversarial input (string literals containing semicolons,
 * line/block comment markers, doubled-quote escapes, and dollar-brace
 * variables with regex metacharacters). ScalaCheck generators drive many
 * random cases per property.
 */
class SqlParserPropertySpec extends AnyFunSuite with Matchers {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // a string literal whose CONTENT may contain statement/comment markers;
  // single quotes are escaped SQL-style by doubling
  private val literalContent: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(';', '-', '/', '*', ' ', '\'', '$', '{', '}')))
      .map(_.mkString.replace("'", "''"))

  private val statement: Gen[String] = for {
    id <- Gen.identifier.suchThat(_.nonEmpty)
    lit <- literalContent
  } yield s"SELECT '$lit' AS $id FROM t"

  test("splitStatements recovers the original statements whatever the literals contain") {
    samples(Gen.nonEmptyListOf(statement).map(_.take(5))).foreach { stmts =>
      SqlBase.splitStatements(stmts.mkString(" ; ")) shouldBe stmts.map(_.trim)
    }
  }

  test("stripComments is idempotent and never touches string literals") {
    samples(statement).foreach { s =>
      val once = SqlBase.stripComments(s)
      SqlBase.stripComments(once) shouldBe once
      once shouldBe s // statements contain no comments outside literals
    }
    // and with real comments attached, the literal part survives intact
    samples(statement).foreach { s =>
      val commented = s"-- leading\n$s /* trailing */ -- eol"
      val stripped = SqlBase.stripComments(commented)
      stripped should include(s)
      (stripped should not).include("leading")
      (stripped should not).include("trailing")
    }
  }

  test("resolveVariables substitutes bound vars verbatim (regex metachars included)") {
    val value: Gen[String] =
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('$', '\\', '{', '}', '.', '*', '(', ')')))
        .map(_.mkString)
    samples(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), value)).foreach { case (k, v) =>
      SqlBase.resolveVariables(s"a $${$k} b", Map(k -> v)) shouldBe s"a $v b"
      // unknown vars survive untouched
      SqlBase.resolveVariables(s"a $${missing_$k} b", Map(k -> v)) shouldBe s"a $${missing_$k} b"
    }
  }

  test("flat field specs round-trip for arbitrary names/positions/types") {
    import graft.source.FlatFields
    val field = Gen.zip(Gen.identifier.suchThat(_.nonEmpty),
      Gen.chooseNum(1, 500), Gen.chooseNum(1, 80),
      Gen.oneOf("string", "int", "long", "double"))
    samples(Gen.nonEmptyListOf(field).map(_.take(8)), 150).foreach { fs =>
      val spec = fs.map { case (n, s, l, t) => s"$n:$s-$l $t" }.mkString(", ")
      val parsed = FlatFields.parsePositional(spec)
      parsed.map(p => (p.name, p.start, p.len, p.dataType)) shouldBe fs
    }
    // delimited: gaps between indices are filled with dummy columns
    samples(Gen.chooseNum(2, 9), 50).foreach { idx =>
      val parsed = FlatFields.parseDelimited(s"a:0 string, b:$idx long")
      parsed.length shouldBe idx + 1
      parsed.head.name shouldBe "a"
      parsed.last.name shouldBe "b"
      (1 until idx).foreach(i => parsed(i).name shouldBe s"__dummy_${i}__")
    }
  }

  test("jdbc templating extracts placeholders in order and escapes nothing else") {
    import graft.sink.JdbcTemplating
    val ident = Gen.identifier.suchThat(s => s.nonEmpty && !s.head.isDigit)
    samples(Gen.nonEmptyListOf(ident).map(_.take(6)), 150).foreach { fields =>
      val sql = s"INSERT INTO t VALUES (${fields.map("@" + _).mkString(", ")})"
      val tpl = JdbcTemplating.compile(sql)
      tpl.bindFields shouldBe fields
      tpl.sql shouldBe s"INSERT INTO t VALUES (${fields.map(_ => "?").mkString(", ")})"
    }
  }

  test("derived hash family stays within int64-safe bounds for any base hash") {
    import org.apache.spark.sql.functions.{col, lit}
    // pure-Scala mirror of Hashing.derivedHash arithmetic on random bases
    samples(Gen.chooseNum(0L, (1L << 60) - 1), 300).foreach { base =>
      (0 until 8).foreach { j =>
        // operands < 2^31 so the product fits in int64 — replicate and check
        val masked = base & 1073741823L
        masked should be < (1L << 30)
        val a = 0x7FFFFFFFL
        (a * masked + a) should be > 0L // no Long overflow at the extremes
      }
    }
  }

  test("classify round-trips set/setrun declarations") {
    samples(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), Gen.alphaNumStr.suchThat(_.nonEmpty))).foreach {
      case (k, v) =>
        SqlBase.classify(s"set $k = $v") match {
          case SqlBase.SetStatement(name, value, _) => name shouldBe k; value shouldBe v
          case other => fail(s"expected SetStatement, got $other")
        }
        SqlBase.classify(s"setrun $k = ($v)") match {
          case SqlBase.SetRunStatement(name, value, _) => name shouldBe k; value shouldBe s"($v)"
          case other => fail(s"expected SetRunStatement, got $other")
        }
    }
  }
}
