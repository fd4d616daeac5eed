"""SPARQL text front-end gates (operators/sparql.py): every query form
parsed from real SPARQL strings and checked for result parity against
the direct kgquery Python-API calls, plus tokenizer/grammar edge cases
and the documented rejections."""

import pytest

from stackoverflowner_spark.operators.sparql import (SparqlSyntaxError,
                                                     parse_query,
                                                     run_sparql)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-sparql", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


TRIPLES = [
    ("numpy", "instance_of", "Library"),
    ("pandas", "instance_of", "Library"),
    ("python", "instance_of", "Language"),
    ("numpy", "mentioned_in", "doc://1"),
    ("pandas", "mentioned_in", "doc://1"),
    ("python", "mentioned_in", "doc://1"),
    ("numpy", "mentioned_in", "doc://2"),
    ("python", "mentioned_in", "doc://3"),
    ("np", "alias_of", "numpy"),
    ("pd", "alias_of", "pandas"),
]


def _df(spark, rows=TRIPLES):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_select_basic(spark):
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x WHERE { ?x instance_of Library }""")
    assert sorted(r.x for r in out.collect()) == ["numpy", "pandas"]


def test_select_join_semicolon_and_literal_forms(spark):
    # ; predicate-object list, <iri> and "string" term forms
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x ?d WHERE {
          ?x instance_of "Library" ; mentioned_in ?d .
          ?x mentioned_in <doc://1>
        }""")
    assert sorted((r.x, r.d) for r in out.collect()) == [
        ("numpy", "doc://1"), ("numpy", "doc://2"), ("pandas", "doc://1")]


def test_select_comma_object_list_and_glued_dot(spark):
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x WHERE {
          ?x mentioned_in doc://1 , doc://2.
        }""")
    assert sorted(r.x for r in out.collect()) == ["numpy"]


def test_prefix_expansion(spark):
    rows = [("https://kg.example/ent/numpy", "instance_of", "Library")]
    out = run_sparql(_df(spark, rows), """
        PREFIX ent: <https://kg.example/ent/>
        SELECT ?t WHERE { ent:numpy instance_of ?t }""")
    assert [r.t for r in out.collect()] == ["Library"]


def test_filter_regex_and_bool_ops(spark):
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x WHERE {
          ?x instance_of ?t .
          FILTER(REGEX(?x, "^p") && ?t != "Library")
        }""")
    assert sorted(r.x for r in out.collect()) == ["python"]


def test_bind_and_order_limit(spark):
    out = run_sparql(_df(spark), """
        SELECT ?u WHERE {
          ?x instance_of Library .
          BIND(UCASE(?x) AS ?u)
        } ORDER BY DESC(?u) LIMIT 1""")
    assert [r.u for r in out.collect()] == ["PANDAS"]


def test_optional_and_not_exists(spark):
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x ?a WHERE {
          ?x instance_of ?t .
          OPTIONAL { ?a alias_of ?x }
          FILTER NOT EXISTS { ?x mentioned_in doc://3 }
        }""")
    got = {(r.x, r.a) for r in out.collect()}
    assert got == {("numpy", "np"), ("pandas", "pd")}


def test_values_and_minus(spark):
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x WHERE {
          ?x instance_of ?t .
          VALUES ?t { Library Language }
          MINUS { ?x mentioned_in doc://2 }
        }""")
    assert sorted(r.x for r in out.collect()) == ["pandas", "python"]


def test_aggregate_group_by_having(spark):
    out = run_sparql(_df(spark), """
        SELECT ?x (COUNT(?d) AS ?n) WHERE {
          ?x mentioned_in ?d
        } GROUP BY ?x HAVING(?n >= 2) ORDER BY ?x""")
    assert [(r.x, r.n) for r in out.collect()] == [
        ("numpy", 2), ("python", 2)]


def test_aggregate_count_distinct_whole_solution(spark):
    out = run_sparql(_df(spark), """
        SELECT (COUNT(DISTINCT ?x) AS ?k) WHERE { ?x mentioned_in ?d }""")
    assert out.collect()[0].k == 3


def test_union(spark):
    out = run_sparql(_df(spark), """
        SELECT ?x WHERE { ?x instance_of Language }
        UNION { ?x alias_of numpy }""")
    assert sorted(r.x for r in out.collect()) == ["np", "python"]


def test_property_path_mini_syntax_passthrough(spark):
    rows = [("a", "subclass_of", "b"), ("b", "subclass_of", "c"),
            ("c", "subclass_of", "d"), ("q", "instance_of", "a")]
    df = _df(spark, rows)
    plus = run_sparql(df, "SELECT ?y WHERE { a subclass_of+ ?y }")
    assert sorted(r.y for r in plus.collect()) == ["b", "c", "d"]
    quant = run_sparql(df, "SELECT ?y WHERE { a subclass_of{2,3} ?y }")
    assert sorted(r.y for r in quant.collect()) == ["c", "d"]
    seq = run_sparql(df, "SELECT ?y WHERE { q instance_of/subclass_of ?y }")
    assert sorted(r.y for r in seq.collect()) == ["b"]
    inv = run_sparql(df, "SELECT ?y WHERE { b ^subclass_of ?y }")
    assert sorted(r.y for r in inv.collect()) == ["a"]


def test_ask_construct_describe(spark):
    df = _df(spark)
    assert run_sparql(df, "ASK { numpy instance_of Library }") is True
    assert run_sparql(df, "ASK WHERE { numpy instance_of Tool }") is False
    built = run_sparql(df, """
        CONSTRUCT { ?a same_kind_as ?x } WHERE {
          ?a alias_of ?x . ?x instance_of Library }""")
    got = {(r.subj, r.pred, r.obj) for r in built.collect()}
    assert got == {("np", "same_kind_as", "numpy"),
                   ("pd", "same_kind_as", "pandas")}
    desc = run_sparql(df, "DESCRIBE ?x WHERE { ?x instance_of Language }")
    got2 = {(r.subj, r.pred, r.obj) for r in desc.collect()}
    assert ("python", "instance_of", "Language") in got2
    assert ("python", "mentioned_in", "doc://1") in got2


def test_update_forms(spark):
    df = _df(spark)
    upd = run_sparql(df, """
        DELETE { ?m mentioned_in ?d } INSERT { ?c mentioned_in ?d }
        WHERE { ?m alias_of ?c . ?m mentioned_in ?d }""")
    # no alias has mentions in the fixture: graph unchanged
    assert upd.count() == len(set(TRIPLES))
    gone = run_sparql(df, "DELETE WHERE { ?x mentioned_in ?d }")
    assert {r.pred for r in gone.collect()} == {"instance_of", "alias_of"}


def test_graph_block(spark):
    rows = [(s, p, o, "page://%d" % (i % 2))
            for i, (s, p, o) in enumerate(TRIPLES)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, url string")
    out = run_sparql(df, """
        SELECT DISTINCT ?x ?g WHERE {
          GRAPH ?g { ?x instance_of Library }
        }""")
    got = {(r.x, r.g) for r in out.collect()}
    assert got == {("numpy", "page://0"), ("pandas", "page://1")}


def test_parse_rejections(spark):
    df = _df(spark)
    with pytest.raises(SparqlSyntaxError, match="OPTIONAL supports"):
        run_sparql(df, """SELECT ?x WHERE { ?x instance_of ?t
            OPTIONAL { ?a alias_of ?x . ?a instance_of ?t2 } }""")
    with pytest.raises(SparqlSyntaxError, match="GROUP BY / HAVING"):
        run_sparql(df, "SELECT ?x WHERE { ?x instance_of ?t } GROUP BY ?x")
    with pytest.raises(SparqlSyntaxError, match="query form"):
        parse_query("FROBNICATE { }")
    with pytest.raises(SparqlSyntaxError, match="tokenize|term|expected"):
        parse_query("SELECT ?x WHERE { ?x }")
    with pytest.raises(SparqlSyntaxError, match="COUNT only"):
        parse_query("SELECT (SUM(DISTINCT ?x) AS ?s) WHERE { ?x p ?y }")


def test_parity_with_python_api(spark):
    from stackoverflowner_spark.operators.kgquery import bgp_match
    df = _df(spark)
    a = run_sparql(df, """
        SELECT DISTINCT ?x ?y ?d WHERE {
          ?x instance_of Library . ?x mentioned_in ?d .
          ?y mentioned_in ?d . ?y instance_of Language }""")
    b = bgp_match(df, [("?x", "instance_of", "Library"),
                       ("?x", "mentioned_in", "?d"),
                       ("?y", "mentioned_in", "?d"),
                       ("?y", "instance_of", "Language")],
                  select=["x", "y", "d"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kgq_cli_sparql_mode(spark, tmp_path, capsys):
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.kgq import main

    p = str(tmp_path / "tri_sparql.parquet")
    _df(spark).write.parquet(p)
    assert main([p, "--sparql",
                 "SELECT ?x (COUNT(?d) AS ?n) WHERE "
                 "{ ?x mentioned_in ?d } GROUP BY ?x "
                 "HAVING(?n >= 2) ORDER BY ?x",
                 "--master", "local[2]"]) == 0
    out = [json.loads(l) for l in
           capsys.readouterr().out.strip().splitlines()]
    assert [(r["x"], r["n"]) for r in out] == [("numpy", 2), ("python", 2)]
    assert main([p, "--sparql", "ASK { numpy instance_of Library }",
                 "--master", "local[2]"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"ask": True}


def test_kgq_cli_requires_exactly_one_mode(spark, tmp_path):
    from tools.kgq import main
    p = str(tmp_path / "tri_modes.parquet")
    _df(spark).write.parquet(p)
    with pytest.raises(SystemExit):
        main([p, "--master", "local[2]"])           # neither
    with pytest.raises(SystemExit):
        main([p, "?x p ?y", "--sparql", "ASK { a p b }",
              "--master", "local[2]"])              # both


def test_nested_subquery_in_text(spark):
    # the full SPARQL 1.1 nested-SELECT idiom, parsed from text
    out = run_sparql(_df(spark), """
        SELECT DISTINCT ?x ?n WHERE {
          ?x instance_of Library .
          { SELECT ?x (COUNT(?d) AS ?n) WHERE { ?x mentioned_in ?d }
            GROUP BY ?x }
          FILTER(?n >= 2)
        }""")
    assert [(r.x, r.n) for r in out.collect()] == [("numpy", 2)]


def test_nested_subquery_in_update(spark):
    out = run_sparql(_df(spark), """
        DELETE { ?x instance_of ?t } INSERT { ?x instance_of Popular }
        WHERE {
          ?x instance_of ?t .
          { SELECT ?x (COUNT(?d) AS ?n) WHERE { ?x mentioned_in ?d }
            GROUP BY ?x }
          FILTER(?n >= 2)
        }""")
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("numpy", "instance_of", "Popular") in got
    assert ("numpy", "instance_of", "Library") not in got
    assert ("pandas", "instance_of", "Library") in got


def test_rdf_type_a_keyword(spark):
    out = run_sparql(_df(spark), "SELECT DISTINCT ?x WHERE { ?x a Library }")
    assert sorted(r.x for r in out.collect()) == ["numpy", "pandas"]
    # 'a' in subject/object position stays a plain term
    rows = [("a", "p", "b")]
    out2 = run_sparql(_df(spark, rows), "SELECT ?y WHERE { a p ?y }")
    assert [r.y for r in out2.collect()] == ["b"]


def test_kgq_cli_srj_format(spark, tmp_path, capsys):
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.kgq import main

    p = str(tmp_path / "tri_srj.parquet")
    _df(spark).write.parquet(p)
    assert main([p, "--sparql",
                 "SELECT DISTINCT ?x WHERE { ?x a Library } ORDER BY ?x",
                 "--format", "srj", "--master", "local[2]"]) == 0
    doc = json.loads(capsys.readouterr().out.strip())
    assert doc["head"]["vars"] == ["x"]
    assert [b["x"]["value"] for b in doc["results"]["bindings"]] == [
        "numpy", "pandas"]
    assert all(b["x"]["type"] == "literal"
               for b in doc["results"]["bindings"])
    assert main([p, "--sparql", "ASK { numpy a Library }",
                 "--format", "srj", "--master", "local[2]"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "head": {}, "boolean": True}


def test_kgq_cli_sparql_over_ntriples(spark, tmp_path, capsys):
    # the two input/query modes compose: full SPARQL over the RDF text
    # export round-trip
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    from stackoverflowner_spark.operators.triples import ntriples_lines
    from tools.kgq import main

    df = spark.createDataFrame(
        [(s, p, o, "u") for s, p, o in TRIPLES],
        "subj string, pred string, obj string, url string")
    nt = str(tmp_path / "kg_sparql_nt")
    ntriples_lines(df).write.text(nt)
    assert main([nt, "--ntriples", "--sparql",
                 "SELECT ?x (COUNT(?d) AS ?n) WHERE "
                 "{ ?x mentioned_in ?d } GROUP BY ?x "
                 "HAVING(?n >= 2) ORDER BY ?x",
                 "--master", "local[2]"]) == 0
    out = [json.loads(l) for l in
           capsys.readouterr().out.strip().splitlines()]
    assert [(r["x"], r["n"]) for r in out] == [("numpy", 2), ("python", 2)]
