"""FastSS fuzzy-join gates: exact-recall parity vs a local brute-force
Levenshtein cross join (d=1 and d=2), planted edit-class specimens, the
ed-2-shares-a-variant false-positive case, min_len handling, and a
no-Cartesian plan gate."""

import random

import pytest

from stackoverflowner_spark.operators.fuzzylink import fuzzy_join
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-fuzzylink", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(ls, rs, d):
    return sorted((a, b, _lev(a, b)) for a in ls for b in rs
                  if _lev(a, b) <= d)


def _rand_strings(n, seed, alpha="abcdef", lo=4, hi=9):
    rng = random.Random(seed)
    out = set()
    while len(out) < n:
        out.add("".join(rng.choice(alpha)
                        for _ in range(rng.randint(lo, hi))))
    return sorted(out)


def _run(spark, ls, rs, d, min_len=3):
    l = spark.createDataFrame([(x,) for x in ls], "mention string")
    r = spark.createDataFrame([(x,) for x in rs], "alias string")
    got = fuzzy_join(l, r, "mention", "alias", max_dist=d,
                     min_len=min_len).collect()
    return sorted((x.mention, x.alias, x.dist) for x in got)


def test_d1_matches_brute_force(spark):
    # small alphabet -> plenty of near-collisions to stress recall
    ls = _rand_strings(120, seed=5)
    rs = _rand_strings(80, seed=6)
    assert _run(spark, ls, rs, d=1) == _brute(ls, rs, 1)


def test_d2_matches_brute_force(spark):
    ls = _rand_strings(60, seed=7)
    rs = _rand_strings(60, seed=8)
    assert _run(spark, ls, rs, d=2) == _brute(ls, rs, 2)


def test_planted_edit_classes(spark):
    # one specimen per edit class against the same alias, plus a
    # distance-2 decoy that d=1 must exclude
    alias = ["spark"]
    mentions = ["spark",    # exact, 0
                "sparc",    # substitution, 1
                "spak",     # deletion, 1
                "sparks",   # insertion, 1
                "sprk",     # deletion, 1
                "sparcs"]   # sub+ins, 2 -> excluded at d=1
    got = _run(spark, mentions, alias, d=1)
    assert got == [("spak", "spark", 1), ("sparc", "spark", 1),
                   ("spark", "spark", 0), ("sparks", "spark", 1),
                   ("sprk", "spark", 1)]
    got2 = _run(spark, mentions, alias, d=2)
    assert ("sparcs", "spark", 2) in got2


def test_shared_variant_at_ed2_is_pruned(spark):
    # 'ab...'/'ba...' share a one-deletion variant but sit at edit
    # distance 2 — the candidate join surfaces them, the levenshtein
    # verify must drop them (FastSS false-positive class)
    assert _run(spark, ["abcd"], ["bacd"], d=1) == []
    assert _lev("abcd", "bacd") == 2


def test_min_len_drops_short_strings(spark):
    got = _run(spark, ["ab", "abcd"], ["ab", "abcd"], d=1, min_len=3)
    assert got == [("abcd", "abcd", 0)]


def _mentions(spark, surfaces):
    rows = [(f"https://h/{i}", 0, 0, 1, s, s, "dict")
            for i, s in enumerate(surfaces)]
    return spark.createDataFrame(
        rows, "url string, sent_idx int, tok_start int, tok_end int, "
              "surface string, surface_norm string, tag_type string")


def test_link_fuzzy_repairs_typos_exact_path_unchanged(spark):
    from stackoverflowner_spark.operators.link import (
        link_broadcast, link_fuzzy)
    from stackoverflowner_spark.sources.dictionary import dictionary_df
    d = dictionary_df(spark)
    # 'pythxon' = 'python' + inserted x (dist 1); 'pandas' exact;
    # 'zzzzzz' matches nothing within dist 1
    m = _mentions(spark, ["pandas", "pythxon", "zzzzzz"])
    exact = link_broadcast(m, d)
    fuzzy = link_fuzzy(m, d)
    # the dictionary carries duplicate alias rows (multiple sources per
    # alias); the flagship dedups at the triple distinct — compare sets
    exact_rows = {(r.surface, r.canonical_id) for r in exact.collect()}
    assert exact_rows == {("pandas", "soft:pandas")}
    got = {(r.surface, r.surface_norm, r.canonical_id)
           for r in fuzzy.collect()}
    # the typo'd row links to python with its ORIGINAL surface kept and
    # surface_norm rewritten to the dictionary form; junk stays unlinked
    assert got == {("pandas", "pandas", "soft:pandas"),
                   ("pythxon", "python", "soft:python")}


def test_link_fuzzy_short_surfaces_not_repaired(spark):
    from stackoverflowner_spark.operators.link import link_fuzzy
    from stackoverflowner_spark.sources.dictionary import dictionary_df
    d = dictionary_df(spark)
    # 'jxva' is dist 1 from 'java' but below min_len=5 -> left unlinked
    m = _mentions(spark, ["jxva"])
    assert link_fuzzy(m, d, min_len=5).count() == 0
    assert link_fuzzy(m, d, min_len=4) \
        .select("surface", "canonical_id").distinct().count() == 1


def test_no_cartesian_in_plan(spark):
    ls = _rand_strings(30, seed=9)
    l = spark.createDataFrame([(x,) for x in ls], "mention string")
    r = spark.createDataFrame([(x,) for x in ls], "alias string")
    df = fuzzy_join(l, r, "mention", "alias", max_dist=1)
    ep = df._jdf.queryExecution().executedPlan()
    if ep.nodeName() == "AdaptiveSparkPlan":
        ep = ep.initialPlan()
    out, stack = [], [ep]
    while stack:
        node = stack.pop()
        out.append(node.nodeName())
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    assert not any("Cartesian" in x or "NestedLoop" in x for x in out), out
