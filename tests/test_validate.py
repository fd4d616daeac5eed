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
