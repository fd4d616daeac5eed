"""N-Triples export gates: line grammar, per-predicate term shapes,
literal/IRI escaping specimens, distinct semantics."""

import re

import pytest

from stackoverflowner_spark.operators.triples import ntriples_lines
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-ntriples", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _lines(spark, rows):
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, url string")
    return sorted(r.line for r in ntriples_lines(df).collect())


def test_term_shapes_per_predicate(spark):
    rows = [("soft:python", "instance_of", "Language", "u"),
            ("soft:python", "mentioned_in", "doc://7", "u"),
            ("python", "alias_of", "soft:python", "u")]
    got = _lines(spark, rows)
    assert got == [
        '<https://kg.example/ent/python> <https://kg.example/pred/'
        'alias_of> <https://kg.example/ent/soft:python> .',
        '<https://kg.example/ent/soft:python> <https://kg.example/pred/'
        'instance_of> "Language" .',
        '<https://kg.example/ent/soft:python> <https://kg.example/pred/'
        'mentioned_in> <doc://7> .',
    ]
    # every line matches the N-Triples line grammar
    pat = re.compile(r'^<[^<>"\s]+> <[^<>"\s]+> '
                     r'(<[^<>"\s]+>|"(\\.|[^"\\])*") \.$')
    for ln in got:
        assert pat.match(ln), ln


def test_literal_escaping(spark):
    rows = [("e", "instance_of", 'say "hi"\n\tback\\slash', "u")]
    (ln,) = _lines(spark, rows)
    assert ln == ('<https://kg.example/ent/e> '
                  '<https://kg.example/pred/instance_of> '
                  '"say \\"hi\\"\\n\\tback\\\\slash" .')


def test_iri_escaping(spark):
    rows = [("bad id<>|", "alias_of", "ok", "u")]
    (ln,) = _lines(spark, rows)
    assert ln.startswith('<https://kg.example/ent/bad%20id%3C%3E%7C> ')
    # percent signs themselves encode first (no double-encoding)
    rows2 = [("50%", "alias_of", "ok", "u")]
    (ln2,) = _lines(spark, rows2)
    assert ln2.startswith('<https://kg.example/ent/50%25> ')


def test_evidence_rows_collapse_to_distinct_triples(spark):
    rows = [("a", "alias_of", "b", "u1"), ("a", "alias_of", "b", "u2")]
    assert len(_lines(spark, rows)) == 1