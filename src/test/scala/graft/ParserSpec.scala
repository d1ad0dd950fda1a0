package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kql.{Parser, Ast}
import Ast._

class ParserSpec extends AnyFunSuite {

  private def parse(q: String): Statements = new Parser(q).parseStatements()
  private def q1(q: String): Query = parse(q).query

  test("pipeline of ops") {
    val q = q1("T | where a > 1 | project a, b | take 5")
    assert(q.source == TableRef("T"))
    assert(q.ops.length == 3)
    assert(q.ops(0).isInstanceOf[Where])
    assert(q.ops(2) == Take(5))
  }

  test("expression precedence: or < and < cmp < add < mul") {
    val Where(e) = q1("T | where a + 1 * 2 > 3 and b == 4 or c < 5").ops.head: @unchecked
    val BinOp("or", l, _) = e: @unchecked
    val BinOp("and", BinOp(">", BinOp("+", Col("a"), BinOp("*", Lit(1L), Lit(2L))), Lit(3L)), _) = l: @unchecked
  }

  test("string operators incl. negation and case variants") {
    val Where(e) = q1("T | where s contains 'x' and s !contains 'y' and s has_cs 'Z'").ops.head: @unchecked
    assert(e.toString.contains("contains"))
    val Where(m) = q1("T | where s matches regex '^a.*'").ops.head: @unchecked
    assert(m == BinOp("matches", Col("s"), Lit("^a.*")))
  }

  test("datetime and timespan literals") {
    val Where(BinOp("<", _, Lit(ts: java.sql.Timestamp))) =
      q1("T | where d < datetime(1998-09-02)").ops.head: @unchecked
    assert(ts.toString.startsWith("1998-09-02"))
    val Where(BinOp(">", _, Lit(Timespan(us)))) =
      q1("T | where x > 30m").ops.head: @unchecked
    assert(us == 30L * 60 * 1000000)
    val Where(BinOp(">", _, Lit(Timespan(us2)))) =
      q1("T | where x > time(1.5h)").ops.head: @unchecked
    assert(us2 == (1.5 * 3600 * 1e6).toLong)
  }

  test("hyphen keywords lex as single operator; a-b stays arithmetic") {
    assert(q1("T | project-away a*, b").ops.head == ProjectAway(List("a*", "b")))
    val Extend(items) = q1("T | extend d = a - b").ops.head: @unchecked
    assert(items.head._2 == BinOp("-", Col("a"), Col("b")))
  }

  test("join with kind, hint, and $left/$right keys") {
    val JoinOp(kind, hint, right, keys) =
      q1("A | join kind=leftouter hint.strategy=broadcast (B | where x > 1) on $left.a == $right.b, c")
        .ops.head: @unchecked
    assert(kind == "leftouter" && hint.contains("broadcast"))
    assert(right.ops.length == 1)
    assert(keys == List(JoinKey("a", "b"), JoinKey("c", "c")))
  }

  test("summarize with aliases and by") {
    val Summarize(aggs, by, _) =
      q1("T | summarize n=count(), s=sum(x) by g, h=bin(ts, 1h)").ops.head: @unchecked
    assert(aggs.map(_._1) == List(Some("n"), Some("s")))
    assert(by.length == 2 && by(1)._1.contains("h"))
  }

  test("let statements: scalar vs tabular") {
    val st = parse("let c = 5; let t = T | where x > c; t | count")
    assert(st.lets(0)._2.isLeft)
    assert(st.lets(1)._2.isRight)
  }

  test("datatable inline rows") {
    val DataTable(schema, rows) =
      q1("datatable(a:string, b:long) ['x', 1, 'y', 2] | count").source: @unchecked
    assert(schema == List("a" -> "string", "b" -> "long"))
    assert(rows.length == 2)
  }

  test("make-series clause") {
    val ms = q1("E | make-series n=count() default=0 on ts from datetime(2024-01-01) to datetime(2024-02-01) step 1d by k")
      .ops.head.asInstanceOf[MakeSeries]
    assert(ms.by.length == 1)
    assert(ms.step == Lit(Timespan(86400000000L)))
  }

  test("in / between, negated and case-insensitive") {
    val Where(InList(_, vs, neg, ci)) = q1("T | where x in~ ('A', 'B')").ops.head: @unchecked
    assert(!neg && ci && vs.length == 2)
    val Where(BetweenOp(_, _, _, neg2)) = q1("T | where x !between (1 .. 5)").ops.head: @unchecked
    assert(neg2)
  }

  test("parse operator segments") {
    val ParseOp(_, segs, _) = q1("""E | parse props with '{"k": ' v:long '}'""").ops.head: @unchecked
    assert(segs == List(ParseLit("{\"k\": "), ParseCol("v", Some("long")), ParseLit("}")))
  }

  test("parse errors carry position") {
    val e = intercept[RuntimeException](q1("T | where"))
    assert(e.getMessage.contains("offset"))
    intercept[RuntimeException](q1("T | frobnicate x"))
  }

  test("bracket-quoted column names") {
    val Project(items) = q1("T | project ['weird name']").ops.head: @unchecked
    assert(items.head._2 == Col("weird name"))
  }
}
