"""SPARQL text front-end: parse real SPARQL query strings and run them
on the kgquery engine.

``operators/kgquery.py`` is the EXECUTION surface (BGP compilation,
solution modifiers, query forms); this module is the missing syntax
layer so a user can hand the engine an actual SPARQL string instead of
Python pattern tuples. A compact recursive-descent parser covers the
subset the engine executes — which, after r5n/r5o, is most of SPARQL
1.1's query and update core:

* query forms: SELECT [DISTINCT], ASK, CONSTRUCT, DESCRIBE,
  DELETE/INSERT WHERE (incl. the ``DELETE WHERE`` shorthand);
* group graph patterns: triple blocks with ``;`` predicate-object and
  ``,`` object lists, FILTER(expr), BIND(expr AS ?v),
  OPTIONAL { single pattern } (multi-pattern OPTIONAL blocks are
  rejected with a clear error — the engine left-joins per pattern),
  FILTER [NOT] EXISTS { ... }, MINUS { ... }, VALUES, GRAPH,
  top-level { } UNION { };
* solution modifiers: GROUP BY, HAVING, ORDER BY [ASC|DESC],
  LIMIT, OFFSET; aggregates COUNT/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT
  (+ COUNT(DISTINCT ?x)) with ``(agg AS ?alias)``;
* property paths ride the engine's predicate mini-syntax UNCHANGED:
  ``a/b``, ``^p``, ``p1|p2``, ``!p``, ``p+``, ``p*``, ``p{1,3}`` are
  all legal predicate tokens here and compile exactly as documented on
  ``kgquery._pattern_df``;
* PREFIX declarations: ``pre:local`` expands to the prefix IRI text +
  local part (this KG's term domain is plain strings, so ``<iri>``
  terms contribute their INNER text and quoted literals their
  content — the engine dialect, documented).

Expression translation (FILTER/BIND/HAVING): ``?var`` -> ``var``,
``&&`` -> AND, ``||`` -> OR, and a keyword table (REGEX ->
regexp_like, STRLEN -> length, UCASE/LCASE -> upper/lower,
STRSTARTS/STRENDS -> startswith/endswith) — everything else passes
through to Spark SQL verbatim, so the supported expression surface is
the (large) SPARQL ∩ Spark-SQL intersection; unsupported builtins fail
at analysis with Spark's own error, never silently.

Nested ``{ SELECT ... }`` subqueries are supported: each evaluates
bottom-up to a solution DataFrame and joins the enclosing block on
shared variables (the kgquery ``subselects`` mechanism), to arbitrary
nesting depth. The bare predicate ``a`` maps to this KG's type
predicate ``instance_of`` (SPARQL's rdf:type keyword, engine mapping).

Out of scope (explicit errors or absent): SERVICE federation,
blank-node syntax, datatyped/lang-tagged literal semantics, property
paths inside parentheses.

Scale: parsing is driver-side string work on a query-sized input;
execution is entirely the kgquery operators' documented plans.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<iri><[^<>\s]*>)
  | (?P<op>>=|<=|!=|&&|\|\||<|>)
  | (?P<var>\?[A-Za-z_]\w*)
  | (?P<lbrace>\{)
  | (?P<rbrace>\})
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<semi>;)
  | (?P<comma>,)
  | (?P<dot>\.(?!\w))
  | (?P<word>[^\s{}()"<>;,]+)
""", re.VERBOSE)

_AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT"}

_EXPR_KEYWORDS = [
    (re.compile(r"\bREGEX\s*\(", re.I), "regexp_like("),
    (re.compile(r"\bSTRLEN\s*\(", re.I), "length("),
    (re.compile(r"\bUCASE\s*\(", re.I), "upper("),
    (re.compile(r"\bLCASE\s*\(", re.I), "lower("),
    (re.compile(r"\bSTRSTARTS\s*\(", re.I), "startswith("),
    (re.compile(r"\bSTRENDS\s*\(", re.I), "endswith("),
]


class SparqlSyntaxError(ValueError):
    pass


_QUANT_CONT = re.compile(r"\{\d+,\d+\}")


def _tokenize(text: str) -> List[Tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(
                f"cannot tokenize at ...{text[pos:pos + 30]!r}")
        pos = m.end()
        kind, val = m.lastgroup, m.group()
        if kind == "ws":
            continue
        if kind == "word":
            # absorb a path quantifier glued to the predicate (p{1,3});
            # a block '{' never matches the {digits,digits} shape
            qm = _QUANT_CONT.match(text, pos)
            if qm:
                val += qm.group()
                pos = qm.end()
            # split a glued triple terminator ("o." style); terms that
            # legitimately end in '.' can be written as "o." literals
            if len(val) > 1 and val.endswith(".") and not qm:
                out.append(("word", val[:-1]))
                out.append(("dot", "."))
                continue
        out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: Dict[str, str] = {}

    # ---- token helpers -------------------------------------------------
    def peek(self, k: int = 0) -> Tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def at_word(self, *words: str) -> bool:
        k, v = self.peek()
        return k == "word" and v.upper() in words

    def eat_word(self, *words: str) -> str:
        if not self.at_word(*words):
            raise SparqlSyntaxError(
                f"expected {'/'.join(words)}, got {self.peek()[1]!r}")
        return self.next()[1].upper()

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise SparqlSyntaxError(f"expected {kind}, got {v!r}")
        return v

    # ---- terms ---------------------------------------------------------
    def term(self) -> str:
        """One RDF term in this KG's plain-string domain."""
        k, v = self.next()
        if k == "var":
            return v
        if k == "string":
            return _unquote(v)
        if k == "iri":
            return v[1:-1]
        if k == "word":
            return self._expand(v)
        raise SparqlSyntaxError(f"expected a term, got {v!r}")

    def _expand(self, word: str) -> str:
        m = re.match(r"^([A-Za-z_][\w-]*):(\S*)$", word)
        if m and m.group(1) in self.prefixes:
            return self.prefixes[m.group(1)] + m.group(2)
        return word

    # ---- expressions (balanced-paren raw capture) ----------------------
    def paren_expr(self) -> str:
        """Consume '(' ... matching ')' and return the TRANSLATED inner
        expression text."""
        self.expect("lparen")
        depth, parts = 1, []
        while depth:
            k, v = self.next()
            if k == "eof":
                raise SparqlSyntaxError("unterminated ( expression")
            if k == "lparen":
                depth += 1
            elif k == "rparen":
                depth -= 1
                if depth == 0:
                    break
            if k == "string":
                parts.append("'" + _unquote(v).replace("'", "''") + "'")
            else:
                parts.append(v)
        return _translate_expr(" ".join(parts))

    # ---- group graph pattern -------------------------------------------
    def group(self) -> Dict:
        """Parse { ... } into the engine's block dict."""
        self.expect("lbrace")
        g: Dict = {"patterns": [], "filters": [], "binds": [],
                   "optional": [], "not_exists": None, "exists": None,
                   "minus": None, "values": None, "graph": None,
                   "subqueries": []}
        while True:
            k, v = self.peek()
            if k == "rbrace":
                self.next()
                break
            if k == "dot":
                self.next()
                continue
            if k == "eof":
                raise SparqlSyntaxError("unterminated { block")
            if (k == "lbrace" and self.peek(1)[0] == "word"
                    and self.peek(1)[1].upper() == "SELECT"):
                # SPARQL 1.1 subquery: { SELECT ... } evaluated
                # bottom-up, joined on shared vars (kgquery subselects)
                self.next()
                self.next()
                g["subqueries"].append(self.select_query())
                self.expect("rbrace")
                continue
            if self.at_word("FILTER"):
                self.next()
                if self.at_word("NOT"):
                    self.next()
                    self.eat_word("EXISTS")
                    if g["not_exists"] is not None:
                        raise SparqlSyntaxError(
                            "one FILTER NOT EXISTS block per group")
                    g["not_exists"] = self.group()["patterns"]
                elif self.at_word("EXISTS"):
                    self.next()
                    if g["exists"] is not None:
                        raise SparqlSyntaxError(
                            "one FILTER EXISTS block per group")
                    g["exists"] = self.group()["patterns"]
                else:
                    g["filters"].append(self.paren_expr())
                continue
            if self.at_word("BIND"):
                self.next()
                inner = self.paren_expr()
                m = re.match(r"^(.*)\s+AS\s+(\w+)\s*$", inner,
                             re.I | re.S)
                if not m:
                    raise SparqlSyntaxError("BIND needs (expr AS ?var)")
                g["binds"].append((m.group(2), m.group(1).strip()))
                continue
            if self.at_word("OPTIONAL"):
                self.next()
                sub = self.group()
                if (len(sub["patterns"]) != 1 or sub["filters"]
                        or sub["binds"] or sub["optional"]):
                    raise SparqlSyntaxError(
                        "OPTIONAL supports a single triple pattern "
                        "(the engine left-joins per pattern; split "
                        "multi-pattern OPTIONALs)")
                g["optional"].append(sub["patterns"][0])
                continue
            if self.at_word("MINUS"):
                self.next()
                if g["minus"] is not None:
                    raise SparqlSyntaxError("one MINUS block per group")
                g["minus"] = self.group()["patterns"]
                continue
            if self.at_word("VALUES"):
                self.next()
                g["values"] = self.values_clause()
                continue
            if self.at_word("GRAPH"):
                self.next()
                if g["graph"] is not None:
                    raise SparqlSyntaxError("one GRAPH scope per group")
                gterm = self.term()
                sub = self.group()
                g["graph"] = gterm
                g["patterns"].extend(sub["patterns"])
                g["filters"].extend(sub["filters"])
                continue
            # triple block with ; and , abbreviations
            s = self.term()
            while True:
                p = self.term()
                if p == "a":  # SPARQL's rdf:type keyword -> the KG's
                    p = "instance_of"  # type predicate (engine mapping)
                while True:
                    o = self.term()
                    g["patterns"].append((s, p, o))
                    if self.peek()[0] == "comma":
                        self.next()
                        continue
                    break
                if self.peek()[0] == "semi":
                    self.next()
                    if self.peek()[0] in ("dot", "rbrace"):
                        break  # trailing ;
                    continue
                break
        return g

    def values_clause(self):
        k, v = self.peek()
        if k == "var":  # VALUES ?x { "a" "b" }
            var = self.next()[1][1:]
            self.expect("lbrace")
            rows = []
            while self.peek()[0] != "rbrace":
                rows.append([self._values_item()])
            self.next()
            return ([var], rows)
        self.expect("lparen")
        vs = []
        while self.peek()[0] == "var":
            vs.append(self.next()[1][1:])
        self.expect("rparen")
        self.expect("lbrace")
        rows = []
        while self.peek()[0] == "lparen":
            self.next()
            row = []
            while self.peek()[0] != "rparen":
                row.append(self._values_item())
            self.next()
            rows.append(row)
        self.expect("rbrace")
        return (vs, rows)

    def _values_item(self):
        if self.at_word("UNDEF"):
            self.next()
            return None
        return self.term()

    # ---- SELECT clause --------------------------------------------------
    def select_clause(self):
        distinct = False
        if self.at_word("DISTINCT"):
            self.next()
            distinct = True
        items: List = []
        star = False
        while True:
            k, v = self.peek()
            if k == "var":
                items.append(("var", self.next()[1][1:]))
            elif k == "word" and v == "*":
                self.next()
                star = True
            elif k == "lparen":
                self.next()
                fn = self.eat_word(*_AGG_FNS)
                self.expect("lparen")
                agg_distinct = False
                if self.at_word("DISTINCT"):
                    self.next()
                    agg_distinct = True
                k2, v2 = self.next()
                if k2 == "var":
                    arg = v2[1:]
                elif k2 == "word" and v2 == "*":
                    arg = "*"
                else:
                    raise SparqlSyntaxError(
                        f"aggregate argument must be ?var or *, got {v2!r}")
                self.expect("rparen")
                self.eat_word("AS")
                alias = self.expect("var")[1:]
                self.expect("rparen")
                if fn == "COUNT" and agg_distinct:
                    fn = "COUNT_DISTINCT"
                elif agg_distinct:
                    raise SparqlSyntaxError(
                        "DISTINCT inside aggregates is supported for "
                        "COUNT only")
                items.append(("agg", fn.lower(), arg, alias))
            else:
                break
        if not items and not star:
            raise SparqlSyntaxError("empty SELECT clause")
        return distinct, star, items

    # ---- solution modifiers ---------------------------------------------
    def modifiers(self):
        mods = {"group_by": None, "having": [], "order_by": None,
                "limit": None, "offset": None}
        while True:
            if self.at_word("GROUP"):
                self.next()
                self.eat_word("BY")
                vs = []
                while self.peek()[0] == "var":
                    vs.append(self.next()[1][1:])
                if not vs:
                    raise SparqlSyntaxError("GROUP BY needs variables")
                mods["group_by"] = vs
            elif self.at_word("HAVING"):
                self.next()
                mods["having"].append(self.paren_expr())
            elif self.at_word("ORDER"):
                self.next()
                self.eat_word("BY")
                ob = []
                while True:
                    if self.peek()[0] == "var":
                        ob.append(self.next()[1][1:])
                    elif self.at_word("ASC", "DESC"):
                        d = self.next()[1].upper()
                        self.expect("lparen")
                        v = self.expect("var")[1:]
                        self.expect("rparen")
                        ob.append(("-" if d == "DESC" else "") + v)
                    else:
                        break
                if not ob:
                    raise SparqlSyntaxError("ORDER BY needs sort keys")
                mods["order_by"] = ob
            elif self.at_word("LIMIT"):
                self.next()
                mods["limit"] = int(self.expect("word"))
            elif self.at_word("OFFSET"):
                self.next()
                mods["offset"] = int(self.expect("word"))
            else:
                break
        return mods

    def select_query(self) -> Dict:
        """SELECT body (the SELECT keyword already consumed) — shared
        by the top-level form and nested ``{ SELECT ... }`` subqueries."""
        distinct, star, items = self.select_clause()
        if self.at_word("WHERE"):
            self.next()
        blocks = [self.group()]
        while self.at_word("UNION"):
            self.next()
            blocks.append(self.group())
        mods = self.modifiers()
        return {"form": "select", "distinct": distinct, "star": star,
                "items": items, "blocks": blocks, **mods}

    # ---- top level -------------------------------------------------------
    def parse(self) -> Dict:
        while self.at_word("PREFIX", "BASE"):
            w = self.next()[1].upper()
            if w == "BASE":
                self.expect("iri")
                continue
            pre = self.expect("word")
            if not pre.endswith(":"):
                raise SparqlSyntaxError(f"bad PREFIX name {pre!r}")
            iri = self.expect("iri")[1:-1]
            self.prefixes[pre[:-1]] = iri

        if self.at_word("SELECT"):
            self.next()
            spec = self.select_query()
            self.expect("eof")
            return spec
        if self.at_word("ASK"):
            self.next()
            if self.at_word("WHERE"):
                self.next()
            g = self.group()
            self.expect("eof")
            return {"form": "ask", "group": g}
        if self.at_word("CONSTRUCT"):
            self.next()
            tmpl = self.group()
            if (tmpl["filters"] or tmpl["binds"] or tmpl["optional"]
                    or tmpl["values"]):
                raise SparqlSyntaxError(
                    "CONSTRUCT template holds only triple patterns")
            self.eat_word("WHERE")
            g = self.group()
            self.expect("eof")
            return {"form": "construct", "template": tmpl["patterns"],
                    "group": g}
        if self.at_word("DESCRIBE"):
            self.next()
            var = self.expect("var")[1:]
            self.eat_word("WHERE")
            g = self.group()
            self.expect("eof")
            return {"form": "describe", "var": var, "group": g}
        if self.at_word("DELETE", "INSERT"):
            delete = insert = None
            if self.at_word("DELETE"):
                self.next()
                if self.at_word("WHERE"):  # DELETE WHERE { } shorthand
                    self.next()
                    g = self.group()
                    self.expect("eof")
                    return {"form": "update", "delete": g["patterns"],
                            "insert": None, "group": g}
                delete = self.group()["patterns"]
            if self.at_word("INSERT"):
                self.next()
                insert = self.group()["patterns"]
            self.eat_word("WHERE")
            g = self.group()
            self.expect("eof")
            return {"form": "update", "delete": delete, "insert": insert,
                    "group": g}
        raise SparqlSyntaxError(
            f"expected a query form, got {self.peek()[1]!r}")


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)",
                  lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(
                      m.group(1), m.group(1)), body)


def _translate_expr(expr: str) -> str:
    out = re.sub(r"\?([A-Za-z_]\w*)", r"\1", expr)
    out = out.replace("&&", " AND ").replace("||", " OR ")
    for pat, rep in _EXPR_KEYWORDS:
        out = pat.sub(rep, out)
    return re.sub(r"\s+", " ", out).strip()


def parse_query(text: str) -> Dict:
    """Parse a SPARQL string to the engine-call spec (see module doc)."""
    return _Parser(text).parse()


def _block_kwargs(g: Dict) -> Dict:
    return dict(optional=g["optional"] or None,
                not_exists=g["not_exists"], exists=g["exists"],
                minus=g["minus"], values=g["values"],
                bind=g["binds"] or None, filters=g["filters"] or None,
                graph=g["graph"])


def _resolve_subs(triples: DataFrame, g: Dict,
                  extra: Optional[Sequence[DataFrame]]):
    """Nested ``{ SELECT ... }`` subqueries evaluate bottom-up to
    solution DataFrames; merge with caller-supplied subselects."""
    subs = [_run_select(triples, sq, None)
            for sq in g.get("subqueries", [])]
    if extra:
        subs.extend(extra)
    return subs or None


def run_sparql(triples: DataFrame, text: str,
               subselects: Optional[Sequence[DataFrame]] = None):
    """Execute a SPARQL string against a (subj, pred, obj[, url]) triple
    DataFrame. Returns a DataFrame for SELECT/CONSTRUCT/DESCRIBE/
    DELETE-INSERT, a bool for ASK. ``subselects`` (Python-side solution
    DataFrames) join the WHERE block as in ``bgp_match``; nested
    ``{ SELECT ... }`` blocks in the text compile to the same mechanism
    recursively."""
    from .kgquery import ask, construct, describe, update_triples
    q = parse_query(text)
    if q["form"] == "ask":
        g = q["group"]
        subselects = _resolve_subs(triples, g, subselects)
        # all-literal patterns are existence tests the BGP compiler
        # rejects by design; their truth factorizes out of the
        # conjunction (they bind nothing), so check them directly
        from pyspark.sql import functions as F
        lits = [p for p in g["patterns"]
                if not any(t.startswith("?") for t in p)]
        rest = [p for p in g["patterns"] if p not in lits]
        for s, p, o in lits:
            hit = (triples.filter((F.col("subj") == s)
                                  & (F.col("pred") == p)
                                  & (F.col("obj") == o))
                   .limit(1).count() > 0)
            if not hit:
                return False
        if not rest:
            return True
        return ask(triples, rest, subselects=subselects,
                   **_block_kwargs(g))
    if q["form"] == "construct":
        g = q["group"]
        return construct(triples, g["patterns"], template=q["template"],
                         subselects=_resolve_subs(triples, g, subselects),
                         **_block_kwargs(g))
    if q["form"] == "describe":
        g = q["group"]
        return describe(triples, g["patterns"], var=q["var"],
                        subselects=_resolve_subs(triples, g, subselects),
                        **_block_kwargs(g))
    if q["form"] == "update":
        g = q["group"]
        return update_triples(triples, g["patterns"], delete=q["delete"],
                              insert=q["insert"],
                              subselects=_resolve_subs(triples, g,
                                                       subselects),
                              **_block_kwargs(g))
    return _run_select(triples, q, subselects)


def _run_select(triples: DataFrame, q: Dict,
                subselects: Optional[Sequence[DataFrame]]):
    from .kgquery import bgp_agg, bgp_match, union_bgp
    blocks = q["blocks"]
    aggs = [it for it in q["items"] if it[0] == "agg"]
    sel_vars = [it[1] for it in q["items"] if it[0] == "var"]
    if len(blocks) > 1:
        if aggs:
            raise SparqlSyntaxError("aggregates over UNION blocks are "
                                    "not supported")
        for b in blocks:
            if (b["filters"] or b["binds"] or b["optional"]
                    or b["not_exists"] or b["exists"] or b["minus"]
                    or b["values"] or b["graph"] or b["subqueries"]):
                raise SparqlSyntaxError(
                    "UNION blocks support plain triple patterns "
                    "(no OPTIONAL/FILTER/etc inside)")
        return union_bgp(triples, [b["patterns"] for b in blocks],
                         select=sel_vars or None)
    g = blocks[0]
    subselects = _resolve_subs(triples, g, subselects)
    if not aggs and (q["group_by"] or q["having"]):
        raise SparqlSyntaxError(
            "GROUP BY / HAVING require an aggregate in SELECT")
    if aggs:
        if sel_vars and not q["group_by"]:
            raise SparqlSyntaxError(
                "non-aggregate SELECT vars require GROUP BY")
        out = bgp_agg(triples, g["patterns"],
                      group_by=q["group_by"] or [],
                      aggs=[(fn, arg, alias) for _, fn, arg, alias in aggs],
                      having=q["having"] or None,
                      subselects=subselects,
                      solution_distinct=False,
                      **_block_kwargs(g))
        if q["order_by"]:
            from pyspark.sql import functions as F
            cols = [F.col(o[1:]).desc() if o.startswith("-") else F.col(o)
                    for o in q["order_by"]]
            out = out.orderBy(*cols)
        if q["offset"]:
            out = out.offset(q["offset"])
        if q["limit"] is not None:
            out = out.limit(q["limit"])
        return out
    return bgp_match(triples, g["patterns"],
                     select=(None if q["star"] else sel_vars or None),
                     distinct=q["distinct"],
                     order_by=q["order_by"], limit=q["limit"],
                     offset=q["offset"], subselects=subselects,
                     **_block_kwargs(g))
