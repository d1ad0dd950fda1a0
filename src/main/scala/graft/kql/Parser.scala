package graft.kql

import Ast._
import Lexer._

/** Hand-written recursive-descent KQL parser (SURVEY.md §3.2 E1).
  * No parser-generator deps (offline env). Keeps the raw source around so
  * unquoted `datetime(2024-01-01)` literals can be sliced verbatim.
  */
final class Parser(src: String) {
  private val toks: Vector[Tok] = Lexer.lex(src)
  private var p = 0

  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg at offset $pos: ...${src.drop(pos).take(40)}")

  private def cur: Tok = toks(p)
  private def ahead(k: Int): Tok = toks(math.min(p + k, toks.length - 1))
  private def bump(): Tok = { val t = cur; p += 1; t }
  private def fail(msg: String): Nothing = throw ParseError(msg, cur.pos)

  private def isIdent(s: String): Boolean = cur match {
    case TIdent(x, _) => x.equalsIgnoreCase(s); case _ => false }
  private def isSym(s: String): Boolean = cur match {
    case TSym(x, _) => x == s; case _ => false }
  private def eatIdent(s: String): Unit =
    if (isIdent(s)) p += 1 else fail(s"expected '$s'")
  private def eatSym(s: String): Unit =
    if (isSym(s)) p += 1 else fail(s"expected '$s'")
  private def tryIdent(s: String): Boolean = { if (isIdent(s)) { p += 1; true } else false }
  private def trySym(s: String): Boolean = { if (isSym(s)) { p += 1; true } else false }
  private def identName(): String = cur match {
    case TIdent(s, _) => p += 1; s
    case TStr(s, _) => p += 1; s // ["quoted column"] style handled elsewhere; bare string ok
    case _ => fail("expected identifier")
  }

  // ================================================================ entry
  def parseStatements(): Statements = {
    val lets = List.newBuilder[(String, Either[Expr, Query])]
    var funcs = Map.empty[String, (List[String], Expr)]
    var tabFuncs = Map.empty[String, (String, List[String], Query)]
    var materialized = Set.empty[String]
    // ADX `set option[= value];` request properties: accepted and
    // dropped — the options steer SERVICE behavior (truncation limits,
    // result caching, consistency) that has no local counterpart; this
    // engine never truncates and has no results cache, so every option
    // is already satisfied vacuously. Paren-free guard: only `set`
    // followed by an option ident then `;` or `=` is a statement, so a
    // TABLE named `set` still resolves.
    while (isIdent("set") && (ahead(1) match {
        case TIdent(_, _) => ahead(2) match {
          case TSym(";", _) | TSym("=", _) => true
          case _ => false
        }
        case _ => false
      })) {
      p += 1
      identName() // option name
      if (trySym("=")) parseExpr() // option value, dropped
      eatSym(";")
    }
    while (isIdent("let")) {
      p += 1
      val name = identName()
      eatSym("=")
      // scalar lambda: let f = (x:long, ...) { expr };
      val isLambda = isSym("(") && (((ahead(1), ahead(2))) match {
        case (TIdent(_, _), TSym(":", _)) => true
        case (TSym(")", _), _) => true
        case _ => false
      })
      if (isLambda) {
        p += 1 // (
        val params = List.newBuilder[(String, Boolean)] // (name, isTabular)
        while (!isSym(")")) {
          val pn = identName(); eatSym(":")
          // scalar type is an ident; a parenthesized type — (*) or an
          // explicit schema — marks a tabular parameter (KQL functions)
          val tabular = if (isSym("(")) {
            var depth = 0
            do {
              cur match {
                case TSym("(", _) => depth += 1
                case TSym(")", _) => depth -= 1
                case _ => ()
              }
              p += 1
            } while (depth > 0)
            true
          } else { identName(); false }
          params += ((pn, tabular))
          if (!isSym(")")) eatSym(",")
        }
        eatSym(")")
        eatSym("{")
        val ps = params.result()
        if (ps.exists(_._2)) {
          val (tabP, scalarPs) = (ps.filter(_._2), ps.filterNot(_._2))
          if (tabP.length != 1) fail("tabular lambda needs exactly one table parameter")
          val body = parseQuery()
          eatSym("}")
          eatSym(";")
          tabFuncs += name -> ((tabP.head._1, scalarPs.map(_._1), body))
        } else {
          val body = parseExpr()
          eatSym("}")
          eatSym(";")
          funcs += name -> ((ps.map(_._1), body))
        }
      } else {
      
      // a '|' at paren-depth 0 before ';' ⇒ tabular let; lone ident ⇒ table
      // alias; otherwise scalar expr.
      val isTabular = {
        var k = p; var depth = 0; var sawPipe = false; var done = false
        while (!done) toks(k) match {
          case TSym("(", _) | TSym("[", _) => depth += 1; k += 1
          case TSym(")", _) | TSym("]", _) => depth -= 1; k += 1
          case TSym("|", _) if depth == 0 => sawPipe = true; done = true
          case TSym(";", _) if depth == 0 => done = true
          case TEof(_) => done = true
          case _ => k += 1
        }
        sawPipe || (toks(p).isInstanceOf[TIdent] &&
          (toks(p + 1) match { case TSym(";", _) => true; case _ => false })) ||
          // pipe-less tabular sources are still tabular bindings:
          // datatable literals and union-of-subqueries
          (toks(p) match {
            case TIdent(n, _) => n.equalsIgnoreCase("datatable") ||
              n.equalsIgnoreCase("union")
            case _ => false
          })
      }
      // let x = materialize(pipeline); → tabular let + cache marker
      if (isIdent("materialize") && (ahead(1) match {
            case TSym("(", _) => true; case _ => false })) {
        p += 2
        lets += name -> Right(parseQuery())
        materialized += name
        eatSym(")")
      }
      else if (isTabular) lets += name -> Right(parseQuery())
      else lets += name -> Left(parseExpr())
      eatSym(";")
      }
    }
    val q = parseQuery()
    cur match {
      case TEof(_) => ()
      case TSym(";", _) if ahead(1).isInstanceOf[TEof] => ()
      case _ => fail("trailing tokens after query")
    }
    Statements(lets.result(), q, funcs, tabFuncs, materialized)
  }

  // ================================================================ query
  def parseQuery(): Query = {
    val source = parseSource()
    val ops = List.newBuilder[TabOp]
    while (trySym("|")) ops += parseTabOp()
    Query(source, ops.result())
  }

  private def parseSource(): Source = {
    if (trySym("(")) { val q = parseQuery(); eatSym(")"); return q.source match {
      case s if q.ops.isEmpty => s
      case _ => fail("parenthesized piped source only allowed in join/union")
    } }
    cur match {
      case TIdent(kw, _) if kw.equalsIgnoreCase("datatable") =>
        p += 1; parseDatatable()
      case TIdent(kw, _) if kw.equalsIgnoreCase("print") =>
        p += 1; PrintSource(parseNamedExprList())
      case TIdent(kw, _) if kw.equalsIgnoreCase("range") =>
        p += 1
        val col = identName()
        eatIdent("from"); val from = parseExpr()
        eatIdent("to"); val to = parseExpr()
        eatIdent("step"); val step = parseExpr()
        RangeSource(col, from, to, step)
      case TIdent(kw, _) if kw.equalsIgnoreCase("find") =>
        p += 1
        eatIdent("in"); eatSym("(")
        val tables = List.newBuilder[String]
        tables += identName()
        while (trySym(",")) tables += identName()
        eatSym(")")
        eatIdent("where")
        FindSource(tables.result(), parseExpr())
      case TIdent(kw, _) if kw.equalsIgnoreCase("union") =>
        p += 1
        val (kind, withSource, fuzzy) = parseUnionParams()
        val tables = parseUnionOperands()
        UnionSource(kind, withSource, tables, fuzzy)
      case TIdent(kw, _) if kw.equalsIgnoreCase("externaldata") =>
        p += 1
        eatSym("(")
        val schema = List.newBuilder[(String, String)]
        var more = true
        while (more) {
          val n = identName(); eatSym(":"); val t = identName()
          schema += n -> t
          more = trySym(",")
        }
        eatSym(")")
        eatSym("[")
        val uris = List.newBuilder[String]
        while (!isSym("]")) {
          cur match {
            case TStr(s, _) => p += 1; uris += s
            case _ => fail("externaldata expects string URIs")
          }
          if (!isSym("]")) eatSym(",")
        }
        eatSym("]")
        val opts = Map.newBuilder[String, String]
        if (tryIdent("with")) {
          eatSym("(")
          while (!isSym(")")) {
            val pname = identName(); eatSym("=")
            cur match {
              case TStr(s2, _) => p += 1; opts += pname.toLowerCase -> s2
              case TIdent(s2, _) => p += 1; opts += pname.toLowerCase -> s2
              case _ => fail("externaldata with(...) expects k='v' pairs")
            }
            trySym(",")
          }
          eatSym(")")
        }
        ExternalData(schema.result(), uris.result(), opts.result())
      // cluster('c').database('d').T / database('d').T — the ADX
      // cross-database qualifiers (guarded on the following '(' so
      // plain tables named `database` still resolve)
      case TIdent(kw, _) if kw.equalsIgnoreCase("cluster") &&
          ahead(1).isInstanceOf[TSym] && isAheadSym(1, "(") =>
        p += 1
        val cl = qualifierArg("cluster")
        eatSym("."); eatIdent("database")
        val db = qualifierArg("database")
        eatSym(".")
        QualifiedTableRef(Some(cl), db, identName())
      case TIdent(kw, _) if kw.equalsIgnoreCase("database") &&
          ahead(1).isInstanceOf[TSym] && isAheadSym(1, "(") =>
        p += 1
        val db = qualifierArg("database")
        eatSym(".")
        QualifiedTableRef(None, db, identName())
      // materialized_view('V') — ADX materialized-view source function
      // (guarded on the following '(' so a plain table named
      // materialized_view still resolves)
      case TIdent(kw, _) if kw.equalsIgnoreCase("materialized_view") &&
          ahead(1).isInstanceOf[TSym] && isAheadSym(1, "(") =>
        p += 1
        MaterializedViewRef(qualifierArg("materialized_view"))
      case TIdent(name, _) =>
        p += 1; TableRef(name)
      case _ => fail("expected table source")
    }
  }

  private def isAheadSym(k: Int, s: String): Boolean = ahead(k) match {
    case TSym(x, _) => x == s; case _ => false
  }

  /** `('name')` after a cluster/database qualifier keyword. */
  private def qualifierArg(what: String): String = {
    eatSym("(")
    val v = cur match {
      case TStr(s, _) => p += 1; s
      case TIdent(s, _) => p += 1; s
      case _ => fail(s"$what() expects a name")
    }
    eatSym(")")
    v
  }

  private def parseDatatable(): DataTable = {
    eatSym("(")
    val schema = List.newBuilder[(String, String)]
    var more = true
    while (more) {
      val n = identName(); eatSym(":"); val t = identName()
      schema += n -> t
      more = trySym(",")
    }
    eatSym(")")
    eatSym("[")
    val flat = List.newBuilder[Expr]
    while (!isSym("]")) {
      flat += parseExpr()
      if (!isSym("]")) eatSym(",")
    }
    eatSym("]")
    val cols = schema.result()
    val vals = flat.result()
    if (cols.nonEmpty && vals.length % cols.length != 0)
      fail(s"datatable values (${vals.length}) not a multiple of schema width (${cols.length})")
    DataTable(cols, vals.grouped(cols.length).toList)
  }

  // ============================================================= tab ops
  private def parseTabOp(): TabOp = cur match {
    case TIdent(kw, _) =>
      val k = kw.toLowerCase
      p += 1
      k match {
        case "where" | "filter" => Where(parseExpr())
        case "project" => Project(parseNamedExprList())
        case "extend" => Extend(parseNamedExprList())
        case "project-away" => ProjectAway(parseIdentList())
        case "project-keep" => ProjectKeep(parseIdentList())
        case "project-rename" =>
          val pairs = List.newBuilder[(String, String)]
          var more = true
          while (more) {
            val nw = identName(); eatSym("="); val old = identName()
            pairs += nw -> old; more = trySym(",")
          }
          ProjectRename(pairs.result())
        case "project-reorder" => ProjectReorder(parseIdentList())
        case "summarize" => parseSummarize()
        case "sort" | "order" => eatIdent("by"); Sort(parseSortKeys())
        case "take" | "limit" => Take(parseLong())
        case "top" =>
          val n = parseLong(); eatIdent("by"); Top(n, parseSortKeys())
        case "top-hitters" =>
          val n = parseLong(); eatIdent("of"); val c = parseExpr()
          val byAgg = if (tryIdent("by")) Some(parseExpr()) else None
          // modeled as summarize+top: planner handles
          TopNested(List(TopNestedLevel(n, (None, c),
            (None, byAgg.getOrElse(App("count", Nil))), asc = false)))
        case "distinct" =>
          if (trySym("*")) DistinctOp(List(Star()))
          else {
            val cols = List.newBuilder[Expr]
            var more = true
            while (more) { cols += parseExpr(); more = trySym(",") }
            DistinctOp(cols.result())
          }
        case "count" => CountOp()
        case "join" => parseJoin()
        case "lookup" =>
          val right = parseJoinRight()
          eatIdent("on")
          LookupOp(right, parseJoinKeys())
        case "union" =>
          val (kind, withSource, fuzzy) = parseUnionParams()
          UnionOp(kind, withSource, parseUnionOperands(), fuzzy)
        case "mv-apply" =>
          val item = parseNamedExpr()
          eatIdent("on")
          eatSym("(")
          val ops = List.newBuilder[TabOp]
          ops += parseTabOp()
          while (trySym("|")) ops += parseTabOp()
          eatSym(")")
          MvApply(item, ops.result())
        case "as" => AsOp(identName())
        case "mv-expand" =>
          var itemIndex: Option[String] = None
          if (isIdent("with_itemindex") && (ahead(1) match {
                case TSym("=", _) => true; case _ => false })) {
            p += 2; itemIndex = Some(identName())
          }
          val items = parseNamedExprList()
          MvExpand(items, itemIndex)
        case "mv-combine" =>
          val cols = List.newBuilder[String]
          cols += identName()
          while (trySym(",")) cols += identName()
          MvCombine(cols.result())
        case "parse" => parseParse(dropNonMatching = false)
        case "parse-where" => parseParse(dropNonMatching = true)
        case "parse-kv" =>
          val src = parseExpr()
          eatIdent("as")
          eatSym("(")
          val keys = List.newBuilder[(String, String)]
          var more = true
          while (more) {
            val n = identName(); eatSym(":"); val t = identName()
            keys += n -> t; more = trySym(",")
          }
          eatSym(")")
          var pairDelim = " "; var kvDelim = "="
          if (tryIdent("with")) {
            eatSym("(")
            while (!isSym(")")) {
              val pname = identName(); eatSym("=")
              val pval = cur match {
                case TStr(s2, _) => p += 1; s2
                case _ => fail("expected string parameter")
              }
              pname.toLowerCase match {
                case "pair_delimiter" => pairDelim = pval
                case "kv_delimiter" => kvDelim = pval
                case _ => ()
              }
              trySym(",")
            }
            eatSym(")")
          }
          ParseKv(src, keys.result(), pairDelim, kvDelim)
        case "getschema" => GetSchemaOp()
        case "serialize" => SerializeOp()
        case "consume" =>
          // optional `decodeblocks=...` tuning is accepted and ignored
          if (tryIdent("decodeblocks")) { eatSym("="); p += 1 }
          ConsumeOp()
        case "fork" =>
          val branches = List.newBuilder[(String, List[TabOp])]
          var i = 0
          var go = true
          while (go) {
            val nm = cur match {
              case TIdent(n, _) if (ahead(1) match {
                case TSym("=", _) => true; case _ => false
              }) => p += 1; eatSym("="); n
              case _ => s"branch$i"
            }
            eatSym("(")
            val ops = List.newBuilder[TabOp]
            // a branch is a pipeline applied to the fork input: ops only
            if (!isSym(")")) {
              ops += parseTabOp()
              while (trySym("|")) ops += parseTabOp()
            }
            eatSym(")")
            branches += nm -> ops.result()
            i += 1
            go = cur match {
              case TIdent(_, _) => true
              case TSym("(", _) => true
              case _ => false
            }
          }
          ForkOp(branches.result())
        case "facet" =>
          eatIdent("by")
          FacetOp(parseIdentList())
        case "scan" =>
          val matchId =
            if (tryIdent("with_match_id")) { eatSym("="); Some(identName()) } else None
          val declares = List.newBuilder[(String, String, Expr)]
          if (tryIdent("declare")) {
            eatSym("(")
            var more = true
            while (more) {
              val n = identName(); eatSym(":"); val t = identName()
              val dflt: Expr =
                if (trySym("=")) parseExpr()
                else t.toLowerCase match {
                  case "long" | "int" | "timespan" => Lit(0L)
                  case "real" | "double" => Lit(0.0)
                  case "bool" | "boolean" => Lit(false)
                  case _ => Lit(null)
                }
              declares += ((n, t, dflt))
              more = trySym(",")
            }
            eatSym(")")
          }
          eatIdent("with")
          eatSym("(")
          val steps = List.newBuilder[ScanStep]
          while (isIdent("step")) {
            p += 1
            val nm = identName()
            // optional `output=all|last|none` directive accepted, ignored
            if (tryIdent("output")) { eatSym("="); identName() }
            eatSym(":")
            val cond = parseExpr()
            val assigns = List.newBuilder[(String, Expr)]
            if (trySym("=>")) {
              var more = true
              while (more) {
                val an = identName(); eatSym("=")
                assigns += an -> parseExpr()
                more = trySym(",")
              }
            }
            trySym(";")
            steps += ScanStep(nm, cond, assigns.result())
          }
          eatSym(")")
          val st = steps.result()
          if (st.isEmpty) fail("scan needs at least one step")
          ScanOp(matchId, declares.result(), st)
        case "render" =>
          // visualization directive: consume `<chart> [with (k=v, ...)]`,
          // semantics are a pass-through (the engine returns the data)
          identName()
          if (tryIdent("with")) {
            eatSym("(")
            var depth = 1
            while (depth > 0) { cur match {
              case TSym("(", _) => depth += 1
              case TSym(")", _) => depth -= 1
              case TEof(_) => fail("unterminated render with(...)")
              case _ => ()
            }; p += 1 }
          }
          RenderOp()
        case "sample" => SampleOp(parseLong())
        case "sample-distinct" =>
          val n = parseLong(); eatIdent("of"); val c = parseExpr()
          SampleDistinctOp(n, c)
        case "search" =>
          cur match {
            case TStr(s, _) => p += 1; SearchOp(s)
            case _ => fail("search expects a string literal")
          }
        case "make-series" => parseMakeSeries()
        case "make-graph" =>
          val src = identName()
          eatSym("-"); eatSym("-"); eatSym(">")
          val dst = identName()
          val nodes = if (tryIdent("with")) {
            val tbl = identName(); eatIdent("on"); Some(tbl -> identName())
          } else None
          MakeGraphOp(src, dst, nodes)
        case "graph-match" =>
          val (pat, whr, prj) = parseGraphPattern()
          GraphMatchOp(pat, whr, prj)
        case "graph-shortest-paths" =>
          val (pat, whr, prj) = parseGraphPattern()
          GraphShortestPathsOp(pat, whr, prj)
        case "graph-to-table" =>
          val what = identName().toLowerCase
          if (what != "nodes" && what != "edges")
            fail("graph-to-table expects 'nodes' or 'edges'")
          GraphToTableOp(what)
        case "graph-mark-components" =>
          val compCol = if (tryIdent("with_component_id")) {
            eatSym("="); identName()
          } else "ComponentId"
          GraphMarkComponentsOp(compCol)
        case "top-nested" => parseTopNested()
        case "invoke" =>
          val fn = identName()
          val args = List.newBuilder[Expr]
          eatSym("(")
          while (!isSym(")")) { args += parseExpr(); if (!isSym(")")) eatSym(",") }
          eatSym(")")
          InvokeOp(fn, args.result())
        case "reduce" => eatIdent("by"); ReduceOp(parseExpr())
        case "partition" =>
          eatIdent("by"); val key = identName()
          eatSym("(")
          val ops = List.newBuilder[TabOp]
          ops += parseTabOp()
          while (trySym("|")) ops += parseTabOp()
          eatSym(")")
          PartitionOp(key, ops.result())
        case "evaluate" =>
          val plugin = identName()
          val args = List.newBuilder[Expr]
          eatSym("(")
          while (!isSym(")")) { args += parseExpr(); if (!isSym(")")) eatSym(",") }
          eatSym(")")
          EvaluateOp(plugin, args.result())
        case other =>
          fail(s"unknown operator '$other'${Suggest.hint(other, Suggest.operators)}")
      }
    case _ => fail("expected operator after |")
  }

  private def parseLong(): Long = cur match {
    case TNum(v: Long, _) => p += 1; v
    case _ => fail("expected integer literal")
  }

  private def parseIdentList(): List[String] = {
    val out = List.newBuilder[String]
    var more = true
    while (more) {
      cur match {
        case TIdent(s, _) =>
          p += 1
          if (trySym("*")) out += s + "*" else out += s
        case TSym("*", _) => p += 1; out += "*"
        case _ => fail("expected column name")
      }
      more = trySym(",")
    }
    out.result()
  }

  /** `(a)-[e]->(b)<-[f*1..3]-(c) [where pred] project items` */
  private def parseGraphPattern(): (List[PatElem], Option[Expr], List[(Option[String], Expr)]) = {
    val elems = List.newBuilder[PatElem]
    def node(): Unit = {
      eatSym("(")
      val nm = if (isSym(")")) None else Some(identName())
      eatSym(")")
      elems += PatNode(nm)
    }
    def edgeBody(): (Option[String], Int, Int) = {
      eatSym("[")
      val nm = if (isSym("*") || isSym("]")) None else Some(identName())
      val (mn, mx) =
        if (trySym("*")) {
          val a = parseLong().toInt
          eatSym("..")
          (a, parseLong().toInt)
        } else (1, 1)
      eatSym("]")
      (nm, mn, mx)
    }
    node()
    var more = true
    while (more) {
      if (trySym("-")) { // -[e]->(n)
        val (nm, mn, mx) = edgeBody()
        eatSym("-"); eatSym(">")
        elems += PatEdge(nm, forward = true, mn, mx)
        node()
      } else if (trySym("<")) { // <-[e]-(n)
        eatSym("-")
        val (nm, mn, mx) = edgeBody()
        eatSym("-")
        elems += PatEdge(nm, forward = false, mn, mx)
        node()
      } else more = false
    }
    val whr = if (tryIdent("where")) Some(parseExpr()) else None
    eatIdent("project")
    (elems.result(), whr, parseNamedExprList())
  }

  /** name = expr | expr   (comma list) */
  private def parseNamedExprList(): List[(Option[String], Expr)] = {
    val out = List.newBuilder[(Option[String], Expr)]
    var more = true
    while (more) {
      out += parseNamedExpr()
      more = trySym(",")
    }
    out.result()
  }

  private def parseNamedExpr(): (Option[String], Expr) = {
    (cur, ahead(1)) match {
      case (TIdent(name, _), TSym("=", _)) if !(ahead(2) match {
            case TSym("=", _) => true; case _ => false }) => // not '=='
        p += 2
        (Some(name), parseExpr())
      case _ => (None, parseExpr())
    }
  }

  private def parseSortKeys(): List[SortKey] = {
    val out = List.newBuilder[SortKey]
    var more = true
    while (more) {
      val e = parseExpr()
      // KQL default sort order is DESC (SURVEY §7.4)
      var asc = false
      var explicit = false
      if (tryIdent("asc")) { asc = true; explicit = true }
      else if (tryIdent("desc")) { asc = false; explicit = true }
      var nullsFirst: Option[Boolean] = None
      if (tryIdent("nulls")) {
        if (tryIdent("first")) nullsFirst = Some(true)
        else { eatIdent("last"); nullsFirst = Some(false) }
      }
      val _ = explicit
      out += SortKey(e, asc, nullsFirst)
      more = trySym(",")
    }
    out.result()
  }

  private def parseSummarize(): Summarize = {
    // leading `hint.shufflekey=col` / `hint.num_partitions=n` pairs
    var hints = Map.empty[String, String]
    while (isIdent("hint") && (ahead(1) match { case TSym(".", _) => true; case _ => false })) {
      p += 2
      val hname = identName().toLowerCase
      eatSym("=")
      val hval = cur match {
        case TIdent(v, _) => p += 1; v
        case TNum(v, _) => p += 1; v.toString
        case TStr(v, _) => p += 1; v
        case _ => fail("expected hint value")
      }
      hints += hname -> hval
    }
    // `summarize by g` (no aggs) is legal
    if (tryIdent("by")) return Summarize(Nil, parseNamedExprList(), hints)
    val aggs = List.newBuilder[(Option[String], Expr)]
    var more = true
    while (more) {
      aggs += parseNamedExpr()
      more = trySym(",")
    }
    val by = if (tryIdent("by")) parseNamedExprList() else Nil
    Summarize(aggs.result(), by, hints)
  }

  private def parseJoin(): JoinOp = {
    var kind = "innerunique"
    var hint: Option[String] = None
    var inParams = true
    while (inParams) {
      if (isIdent("kind") && (ahead(1) match { case TSym("=", _) => true; case _ => false })) {
        p += 2; kind = identName().toLowerCase
      } else if (isIdent("hint") && (ahead(1) match { case TSym(".", _) => true; case _ => false })) {
        p += 2 // hint .
        val hname = identName() // strategy / num_partitions ...
        eatSym("=")
        val hval = cur match {
          case TIdent(s, _) => p += 1; s
          case TNum(v, _) => p += 1; v.toString
          case _ => fail("expected hint value")
        }
        if (hname.equalsIgnoreCase("strategy")) hint = Some(hval.toLowerCase)
      } else inParams = false
    }
    val right = parseJoinRight()
    if (kind == "cross") JoinOp(kind, hint, right, Nil)
    else { eatIdent("on"); JoinOp(kind, hint, right, parseJoinKeys()) }
  }

  private def parseJoinRight(): Query = {
    if (trySym("(")) { val q = parseQuery(); eatSym(")"); q }
    else Query(TableRef(identName()), Nil)
  }

  private def parseJoinKeys(): List[JoinKey] = {
    val out = List.newBuilder[JoinKey]
    var more = true
    while (more) {
      if (trySym("$")) {
        eatIdent("left"); eatSym("."); val l = identName()
        eatSym("=="); eatSym("$"); eatIdent("right"); eatSym("."); val r = identName()
        out += JoinKey(l, r)
      } else {
        val c = identName()
        out += JoinKey(c, c)
      }
      more = trySym(",")
    }
    out.result()
  }

  private def parseUnionParams(): (String, Option[String], Boolean) = {
    var kind = "outer"
    var withSource: Option[String] = None
    var fuzzy = false
    var more = true
    while (more) {
      if (isIdent("kind") && (ahead(1) match { case TSym("=", _) => true; case _ => false })) {
        p += 2; kind = identName().toLowerCase
      } else if (isIdent("withsource") && (ahead(1) match { case TSym("=", _) => true; case _ => false })) {
        p += 2; withSource = Some(identName())
      } else if (isIdent("isfuzzy") && (ahead(1) match { case TSym("=", _) => true; case _ => false })) {
        // ADX semantics: isfuzzy=true tolerates unresolvable legs
        // (skipped at plan time); at least one leg must resolve
        p += 2; fuzzy = identName().equalsIgnoreCase("true")
      } else more = false
    }
    (kind, withSource, fuzzy)
  }

  private def parseUnionOperands(): List[Query] = {
    val out = List.newBuilder[Query]
    var more = true
    while (more) {
      if (trySym("(")) { out += parseQuery(); eatSym(")") }
      else out += Query(TableRef(identName()), Nil)
      more = trySym(",")
    }
    out.result()
  }

  private def parseParse(dropNonMatching: Boolean): ParseOp = {
    // optional kind=simple|regex
    if (isIdent("kind") && (ahead(1) match { case TSym("=", _) => true; case _ => false })) {
      p += 2; identName()
    }
    val source = parseExpr()
    eatIdent("with")
    val segs = List.newBuilder[ParseSeg]
    var done = false
    while (!done) {
      cur match {
        case TStr(s, _) => p += 1; segs += ParseLit(s)
        case TSym("*", _) => p += 1; segs += ParseCol("", None) // wildcard skip
        case TIdent(n, _) if !n.equalsIgnoreCase("with") =>
          p += 1
          val typ = if (trySym(":")) Some(identName()) else None
          segs += ParseCol(n, typ)
        case _ => done = true
      }
      cur match {
        case TEof(_) | TSym("|", _) | TSym(";", _) => done = true
        case _ => ()
      }
    }
    ParseOp(source, segs.result(), dropNonMatching)
  }

  private def parseMakeSeries(): MakeSeries = {
    val aggs = List.newBuilder[(Option[String], Expr, Expr)]
    var more = true
    while (more) {
      val (alias, e) = parseNamedExpr()
      val dflt: Expr =
        if (isIdent("default") && (ahead(1) match { case TSym("=", _) => true; case _ => false })) {
          p += 2; parseExpr()
        } else Lit(0L)
      aggs += ((alias, e, dflt))
      more = trySym(",")
    }
    eatIdent("on")
    val axis = parseExpr()
    var from: Expr = null; var to: Expr = null; var step: Expr = null
    if (tryIdent("from")) { from = parseExpr(); eatIdent("to"); to = parseExpr() }
    else if (tryIdent("in")) { eatIdent("range"); eatSym("("); from = parseExpr()
      eatSym(","); to = parseExpr(); eatSym(","); step = parseExpr(); eatSym(")") }
    if (step == null) { eatIdent("step"); step = parseExpr() }
    val by = if (tryIdent("by")) parseNamedExprList() else Nil
    if (from == null || to == null) fail("make-series requires from/to bounds")
    MakeSeries(aggs.result(), axis, from, to, step, by)
  }

  private def parseTopNested(): TopNested = {
    val levels = List.newBuilder[TopNestedLevel]
    var more = true
    while (more) {
      val n = parseLong()
      eatIdent("of")
      val of = parseNamedExpr()
      // `with others = "label"` folds everything outside the top N
      val others = if (tryIdent("with")) {
        eatIdent("others"); eatSym("=")
        Some(cur match {
          case Lexer.TStr(s, _) => p += 1; s
          case _ => fail("with others expects a string label")
        })
      } else None
      eatIdent("by")
      val by = parseNamedExpr()
      val asc = if (tryIdent("asc")) true else { tryIdent("desc"); false }
      levels += TopNestedLevel(n, of, by, asc, others)
      more = trySym(",") && { eatIdent("top-nested"); true }
    }
    TopNested(levels.result())
  }

  // ================================================================ exprs
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (isIdent("or")) { p += 1; l = BinOp("or", l, parseAnd()) }
    l
  }

  private def parseAnd(): Expr = {
    var l = parseCmp()
    while (isIdent("and")) { p += 1; l = BinOp("and", l, parseCmp()) }
    l
  }

  private val strOps = Set("contains", "has", "startswith", "endswith",
    "hasprefix", "hassuffix", "contains_cs", "has_cs", "startswith_cs",
    "endswith_cs", "matches")

  private def parseCmp(): Expr = {
    var l = parseAdd()
    var done = false
    while (!done) {
      cur match {
        case TSym(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=" | "=~" | "!~" | "<>"), _) =>
          p += 1
          val r = parseAdd()
          l = BinOp(if (op == "<>") "!=" else op, l, r)
        case TSym("!", _) =>
          // !contains / !has / !in / !startswith / !endswith / !between
          ahead(1) match {
            case TIdent(w, _) if strOps.contains(w.toLowerCase) =>
              p += 2
              if (w.equalsIgnoreCase("matches")) eatIdent("regex")
              l = UnOp("not", BinOp(w.toLowerCase, l, parseAdd()))
            case TIdent(w, _) if w.equalsIgnoreCase("in") =>
              p += 2
              val ci = trySym("~")
              l = parseInTail(l, negated = true, ci)
            case TIdent(w, _) if w.equalsIgnoreCase("between") =>
              p += 2
              l = parseBetweenTail(l, negated = true)
            case _ => done = true
          }
        case TIdent(w, _) if strOps.contains(w.toLowerCase) =>
          p += 1
          if (w.equalsIgnoreCase("matches")) eatIdent("regex")
          l = BinOp(w.toLowerCase, l, parseAdd())
        case TIdent(w, _) if w.equalsIgnoreCase("in") =>
          p += 1
          val ci = trySym("~")
          l = parseInTail(l, negated = false, ci)
        case TIdent(w, _) if w.equalsIgnoreCase("has_any") || w.equalsIgnoreCase("has_all") =>
          p += 1
          eatSym("(")
          val terms = List.newBuilder[Expr]
          while (!isSym(")")) { terms += parseExpr(); if (!isSym(")")) eatSym(",") }
          eatSym(")")
          l = App(w.toLowerCase, l :: terms.result())
        case TIdent(w, _) if w.equalsIgnoreCase("between") =>
          p += 1
          l = parseBetweenTail(l, negated = false)
        case _ => done = true
      }
    }
    l
  }

  private def parseInTail(l: Expr, negated: Boolean, ci: Boolean): Expr = {
    eatSym("(")
    val vals = List.newBuilder[Expr]
    while (!isSym(")")) { vals += parseExpr(); if (!isSym(")")) eatSym(",") }
    eatSym(")")
    InList(l, vals.result(), negated, ci)
  }

  private def parseBetweenTail(l: Expr, negated: Boolean): Expr = {
    eatSym("(")
    val lo = parseExpr()
    eatSym("..")
    val hi = parseExpr()
    eatSym(")")
    BetweenOp(l, lo, hi, negated)
  }

  private def parseAdd(): Expr = {
    var l = parseMul()
    var done = false
    while (!done) cur match {
      case TSym("+", _) => p += 1; l = BinOp("+", l, parseMul())
      case TSym("-", _) => p += 1; l = BinOp("-", l, parseMul())
      case _ => done = true
    }
    l
  }

  private def parseMul(): Expr = {
    var l = parseUnary()
    var done = false
    while (!done) cur match {
      case TSym("*", _) => p += 1; l = BinOp("*", l, parseUnary())
      case TSym("/", _) => p += 1; l = BinOp("/", l, parseUnary())
      case TSym("%", _) => p += 1; l = BinOp("%", l, parseUnary())
      case _ => done = true
    }
    l
  }

  private def parseUnary(): Expr = cur match {
    case TSym("-", _) => p += 1; UnOp("-", parseUnary())
    case TIdent(w, _) if w.equalsIgnoreCase("not") && (ahead(1) match {
          case TSym("(", _) => true; case _ => false }) =>
      p += 1; UnOp("not", parsePostfix())
    case _ => parsePostfix()
  }

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    var done = false
    while (!done) cur match {
      case TSym(".", _) =>
        p += 1
        val field = identName()
        e = PathGet(e, Lit(field))
      case TSym("[", _) =>
        p += 1
        val idx = parseExpr()
        eatSym("]")
        e = PathGet(e, idx)
      case _ => done = true
    }
    e
  }

  /** functions whose argument is sliced raw from source (unquoted literal) */
  private val rawArgFns = Set("datetime", "date", "time", "timespan")

  private def parsePrimary(): Expr = cur match {
    case TNum(v, _) => p += 1; Lit(v)
    case TStr(s, _) => p += 1; Lit(s)
    case TTimespan(us, _) => p += 1; Lit(Timespan(us))
    case TSym("(", _) =>
      p += 1; val e = parseExpr(); eatSym(")"); e
    case TSym("*", _) => p += 1; Star()
    case TIdent(w, _) if w.equalsIgnoreCase("true") => p += 1; Lit(true)
    case TIdent(w, _) if w.equalsIgnoreCase("false") => p += 1; Lit(false)
    case TIdent(w, _) if w.equalsIgnoreCase("null") => p += 1; Lit(null)
    case TIdent(w, _) if w.equalsIgnoreCase("dynamic") && (ahead(1) match {
          case TSym("(", _) => true; case _ => false }) =>
      // dynamic([1,2,3]) / dynamic({"k":1}) — slice raw JSON text
      p += 1
      Lit(sliceRawParens())
    case TIdent(w, _) if w.equalsIgnoreCase("toscalar") && (ahead(1) match {
          case TSym("(", _) => true; case _ => false }) =>
      p += 2 // toscalar (
      val q = parseQuery()
      eatSym(")")
      ToScalar(q)
    case TIdent(w, _) if rawArgFns.contains(w.toLowerCase) && (ahead(1) match {
          case TSym("(", _) => true; case _ => false }) =>
      val fn = w.toLowerCase
      p += 1
      val raw = sliceRawParens().trim
      val unq = if ((raw.startsWith("\"") && raw.endsWith("\"")) ||
                    (raw.startsWith("'") && raw.endsWith("'"))) raw.substring(1, raw.length - 1)
                else raw
      if (fn == "datetime" || fn == "date") Lit(Literals.parseDatetime(unq))
      else Lit(Literals.parseTimespan(unq))
    case TIdent(w, _) if (ahead(1) match { case TSym("(", _) => true; case _ => false }) =>
      p += 1 // fn name
      p += 1 // (
      val args = List.newBuilder[Expr]
      while (!isSym(")")) { args += parseExpr(); if (!isSym(")")) eatSym(",") }
      eatSym(")")
      App(w.toLowerCase, args.result())
    case TIdent(w, _) => p += 1; Col(w)
    case TSym("[", _) if (ahead(1) match { case TStr(_, _) => true; case _ => false }) =>
      // ['column name'] quoting
      p += 1
      val name = cur match { case TStr(s, _) => p += 1; s; case _ => fail("bad") }
      eatSym("]")
      Col(name)
    case _ => fail("expected expression")
  }

  /** Consume a balanced `( ... )` group and return the RAW source between
    * the parens (used for datetime/timespan/dynamic literals whose payload
    * doesn't tokenize as KQL). */
  private def sliceRawParens(): String = {
    val open = cur
    eatSym("(")
    val startPos = open.pos + 1
    var depth = 1
    var endPos = startPos
    while (depth > 0) {
      cur match {
        case TSym("(", _) => depth += 1; p += 1
        case TSym(")", pos) => depth -= 1; endPos = pos; p += 1
        case TEof(_) => fail("unterminated ( )")
        case _ => p += 1
      }
    }
    src.substring(startPos, endPos)
  }
}

/** Datetime / timespan literal parsing shared by lexer-adjacent code. */
object Literals {
  def parseDatetime(s: String): java.sql.Timestamp = {
    val t = s.trim
    val iso =
      if (t.length == 10) t + " 00:00:00"
      else t.replace("T", " ")
    // pad fractional seconds if missing
    java.sql.Timestamp.valueOf(
      if (iso.contains(".")) iso else iso + ".0")
  }

  /** KQL timespan string forms: "1.02:03:04.5" (d.hh:mm:ss.frac),
    * "02:03:04", or unit forms "1h"/"90m" (already lexed elsewhere). */
  def parseTimespan(s: String): Ast.Timespan = {
    val t = s.trim
    val unitRe = "(?i)^([0-9]+(?:\\.[0-9]+)?)\\s*(d|day|days|h|hr|hour|hours|m|min|minute|minutes|s|sec|second|seconds|ms|millisecond|milliseconds|tick|ticks)$".r
    t match {
      case unitRe(num, unit) =>
        val mult = unit.toLowerCase match {
          case "d" | "day" | "days" => 86400e6
          case "h" | "hr" | "hour" | "hours" => 3600e6
          case "m" | "min" | "minute" | "minutes" => 60e6
          case "s" | "sec" | "second" | "seconds" => 1e6
          case "ms" | "millisecond" | "milliseconds" => 1e3
          case _ => 0.1
        }
        Ast.Timespan((num.toDouble * mult).round)
      case _ =>
        val re = "^(?:([0-9]+)\\.)?([0-9]{1,2}):([0-9]{2}):([0-9]{2})(?:\\.([0-9]+))?$".r
        t match {
          case re(d, h, m, sec, frac) =>
            val days = if (d == null) 0L else d.toLong
            val fracUs = if (frac == null) 0L
              else (("0." + frac).toDouble * 1e6).round
            Ast.Timespan(((days * 86400L + h.toLong * 3600 + m.toLong * 60 + sec.toLong) * 1000000L) + fracUs)
          case _ => throw new IllegalArgumentException(s"bad timespan literal: $s")
        }
    }
  }
}
