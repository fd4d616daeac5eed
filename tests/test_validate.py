"""Domain/range KG constraint validation (operators/validate.py).

Gates: worked-example violations (domain-only, range-only, both-sides,
multi-typed satisfaction, unruled predicates ignored, NULL-side
unconstrained), brute-force parity on a random KG + random rules, and a
plan gate (broadcast rules, no CartesianProduct/NestedLoop).
"""

import random

import pytest

from stackoverflowner_spark.operators.validate import validate_triples
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-validate", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


TRIPLES = [
    ("soft:numpy", "instance_of", "Library"),
    ("soft:python", "instance_of", "Language"),
    ("soft:python", "instance_of", "Application"),  # multi-typed
    ("soft:numpy", "mentioned_in", "doc://1"),
    ("soft:python", "mentioned_in", "doc://1"),
    ("doc://9", "mentioned_in", "doc://9"),          # corrupt subject
    ("np", "alias_of", "soft:numpy"),
    ("py", "alias_of", "soft:python"),
    ("bad", "alias_of", "doc://1"),                  # alias onto a URL
    ("x", "unruled_pred", "y"),
]


def _dfs(spark, rows=TRIPLES, rules=None):
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    rules = rules or [
        ("mentioned_in", "Library", None),
        ("alias_of", None, "Library"),
    ]
    r = spark.createDataFrame(rules,
                              "pred string, subj_type string, obj_type string")
    return t, r


def test_domain_and_range_violations(spark):
    t, r = _dfs(spark)
    got = sorted((x.subj, x.pred, x.obj, x.violation)
                 for x in validate_triples(t, r).collect())
    assert got == [
        ("bad", "alias_of", "doc://1", "range"),
        ("doc://9", "mentioned_in", "doc://9", "domain"),
        ("py", "alias_of", "soft:python", "range"),
        ("soft:python", "mentioned_in", "doc://1", "domain"),
    ]


def test_multi_typed_entity_satisfies_any(spark):
    t, r = _dfs(spark, rules=[("mentioned_in", "Application", None)])
    got = sorted(x.subj for x in validate_triples(t, r).collect())
    # soft:python is Language AND Application -> passes; numpy + doc://9 fail
    assert got == ["doc://9", "soft:numpy"]


def test_unruled_and_null_sides_ignored(spark):
    t, r = _dfs(spark, rules=[("alias_of", None, None)])
    assert validate_triples(t, r).count() == 0


def test_both_sides_emit_two_rows(spark):
    rows = [("a", "rel", "b")]
    t, r = _dfs(spark, rows=rows,
                rules=[("rel", "TypeA", "TypeB")])
    got = sorted(x.violation for x in validate_triples(t, r).collect())
    assert got == ["domain", "range"]


def _brute(rows, rules):
    types = {}
    for s, p, o in rows:
        if p == "instance_of":
            types.setdefault(s, set()).add(o)
    out = set()
    rmap = {p: (st, ot) for p, st, ot in rules}
    for s, p, o in rows:
        if p not in rmap:
            continue
        st, ot = rmap[p]
        if st is not None and st not in types.get(s, set()):
            out.add((s, p, o, "domain"))
        if ot is not None and ot not in types.get(o, set()):
            out.add((s, p, o, "range"))
    return sorted(out)


def test_brute_force_parity(spark):
    rng = random.Random(20260819)
    ents = [f"e{i}" for i in range(25)]
    tys = ["T1", "T2", "T3"]
    preds = ["p1", "p2", "p3", "p4"]
    rows = sorted({
        *((rng.choice(ents), "instance_of", rng.choice(tys))
          for _ in range(30)),
        *((rng.choice(ents), rng.choice(preds), rng.choice(ents))
          for _ in range(120)),
    })
    rules = [("p1", "T1", None), ("p2", None, "T2"), ("p3", "T2", "T3")]
    t, r = _dfs(spark, rows=rows, rules=rules)
    got = sorted(tuple(x) for x in validate_triples(t, r).collect())
    assert got == _brute(rows, rules)


def test_plan_broadcast_and_no_nested_loop(spark):
    t, r = _dfs(spark)
    plan = (validate_triples(t, r)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # rules ride a broadcast


# ---- SHACL-core subset (r5o) ----

SHAPE_SCHEMA = ("shape_id string, target_class string, path string, "
                "min_count long, max_count long, pattern string, "
                "in_list array<string>")


def _shacl(spark, rows, shapes):
    from stackoverflowner_spark.operators.validate import shacl_validate
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    s = spark.createDataFrame(shapes, SHAPE_SCHEMA)
    return {(r.shape_id, r.focus, r.path, r.violation, r.value)
            for r in shacl_validate(t, s).collect()}


def test_shacl_min_count_zero_triples_violates(spark):
    rows = [("e1", "instance_of", "Library"),
            ("e2", "instance_of", "Library"),
            ("e2", "mentioned_in", "d1")]
    got = _shacl(spark, rows,
                 [("s1", "Library", "mentioned_in", 1, None, None, None)])
    assert got == {("s1", "e1", "mentioned_in", "min_count", "0")}


def test_shacl_max_count(spark):
    rows = [("e1", "instance_of", "Library"),
            ("e1", "alias_of", "a"), ("e1", "alias_of", "b"),
            ("e1", "alias_of", "c")]
    got = _shacl(spark, rows,
                 [("s1", "Library", "alias_of", None, 2, None, None)])
    assert got == {("s1", "e1", "alias_of", "max_count", "3")}


def test_shacl_evidence_duplicates_collapse(spark):
    # the same (s, p, o) asserted twice is ONE value node (RDF set)
    rows = [("e1", "instance_of", "Library"),
            ("e1", "alias_of", "a"), ("e1", "alias_of", "a")]
    got = _shacl(spark, rows,
                 [("s1", "Library", "alias_of", None, 1, None, None)])
    assert got == set()


def test_shacl_pattern_and_in(spark):
    rows = [("e1", "instance_of", "Page"),
            ("e1", "lang", "en"), ("e1", "lang", "zz"),
            ("e1", "url", "https://ok.example/x"),
            ("e1", "url", "ftp://bad.example/y")]
    got = _shacl(spark, rows, [
        ("langs", "Page", "lang", None, None, None, ["en", "de", "fr"]),
        ("urls", "Page", "url", None, None, "^https://.*", None)])
    assert got == {("langs", "e1", "lang", "in", "zz"),
                   ("urls", "e1", "url", "pattern", "ftp://bad.example/y")}


def test_shacl_only_target_class_in_scope(spark):
    rows = [("e1", "instance_of", "Library"),
            ("d9", "mentioned_in", "d9")]   # d9 has no type: not a focus
    got = _shacl(spark, rows,
                 [("s1", "Library", "mentioned_in", 1, None, None, None)])
    assert got == {("s1", "e1", "mentioned_in", "min_count", "0")}


def test_shacl_duckdb_parity(spark):
    import duckdb
    from stackoverflowner_spark.operators.validate import shacl_validate
    rng = random.Random(37)
    ents = [f"e{i}" for i in range(15)]
    rows = sorted(
        {(e, "instance_of", "Library") for e in ents if int(e[1:]) % 3 == 0}
        | {(rng.choice(ents), "alias_of",
            rng.choice(["ok1", "ok2", "Bad3", "zz9"]))
           for _ in range(40)})
    shapes = [("card", "Library", "alias_of", 1, 3, None, None),
              ("pat", "Library", "alias_of", None, None, "^[a-z0-9]+$",
               None),
              ("enum", "Library", "alias_of", None, None, None,
               ["ok1", "ok2"])]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    s = spark.createDataFrame(shapes, SHAPE_SCHEMA)
    got = {(r.shape_id, r.focus, r.path, r.violation, r.value)
           for r in shacl_validate(t, s).collect()}
    con = duckdb.connect()
    con.execute("create table t (subj varchar, pred varchar, obj varchar)")
    con.executemany("insert into t values (?, ?, ?)", rows)
    want = {tuple(r) for r in con.execute("""
        with types as (select distinct subj as focus, obj as etype
                       from t where pred = 'instance_of'),
        foci as (select focus from types where etype = 'Library'),
        vals as (select distinct f.focus, t.obj
                 from foci f join t on t.subj = f.focus
                                   and t.pred = 'alias_of'),
        cnts as (select f.focus,
                        (select count(*) from vals v
                         where v.focus = f.focus) as n from foci f)
        select 'card', focus, 'alias_of', 'min_count', cast(n as varchar)
          from cnts where n < 1
        union all
        select 'card', focus, 'alias_of', 'max_count', cast(n as varchar)
          from cnts where n > 3
        union all
        select 'pat', focus, 'alias_of', 'pattern', obj
          from vals where not regexp_matches(obj, '^[a-z0-9]+$')
        union all
        select 'enum', focus, 'alias_of', 'in', obj
          from vals where obj not in ('ok1', 'ok2')""").fetchall()}
    assert got == want


def test_shacl_plan_broadcast_no_python(spark):
    from stackoverflowner_spark.operators.validate import shacl_validate
    rows = [("e1", "instance_of", "Library"), ("e1", "alias_of", "a")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    s = spark.createDataFrame(
        [("s1", "Library", "alias_of", 1, 3, "^[a-z]+$", ["a"])],
        SHAPE_SCHEMA)
    plan = (shacl_validate(t, s)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
