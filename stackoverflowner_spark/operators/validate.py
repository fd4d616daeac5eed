"""Domain/range constraint validation over the materialized KG.

The publish-side QA gate of a KG-construction pipeline (SHACL-lite):
before triples ship, every ruled predicate is checked against an
ontology-style constraint table — the subject (domain) and/or object
(range) must carry a required ``instance_of`` type. The reference
pipeline has no declarative constraint stage (its QA is the eval scripts
around ``conlleval``); a KG engine needs one: a linking bug that emits
``alias_of`` onto a URL, or ``mentioned_in`` from a non-entity, should
surface as a violation row, not as silent graph corruption.

Semantics:

* ``rules(pred, subj_type, obj_type)`` — one row per constrained
  predicate; a NULL type means that side is unconstrained. Only
  predicates present in ``rules`` are checked at all.
* An entity satisfies a type requirement if ANY of its ``instance_of``
  types matches (entities are multi-typed after canonicalization).
* Output is one row per violated side: (subj, pred, obj, violation)
  with violation in {'domain', 'range'} — a triple failing both emits
  two rows, so the report attributes each failure to the right side.

Scale: rules are ontology-sized — always broadcast; the type table is a
filtered projection of the triple table itself (``pred =
'instance_of'``, pushed to the scan). Each side check is one LEFT ANTI
join of the ruled triples against the type table on (entity, required
type) — shuffle keyed by entity, no corpus-side Python anywhere, and
the anti-join discipline mirrors kgquery's NOT EXISTS compilation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_triples(triples: DataFrame, rules: DataFrame) -> DataFrame:
    """triples(subj, pred, obj) x rules(pred, subj_type, obj_type) ->
    (subj, pred, obj, violation) distinct violation rows."""
    types = (triples.filter(F.col("pred") == "instance_of")
             .select(F.col("subj").alias("ent"),
                     F.col("obj").alias("etype")).distinct())
    ruled = (triples.select("subj", "pred", "obj")
             .join(F.broadcast(rules), "pred", "inner"))

    dom = (ruled.filter(F.col("subj_type").isNotNull())
           .join(types,
                 (F.col("subj") == F.col("ent"))
                 & (F.col("subj_type") == F.col("etype")),
                 "left_anti")
           .select("subj", "pred", "obj",
                   F.lit("domain").alias("violation")))
    rng = (ruled.filter(F.col("obj_type").isNotNull())
           .join(types,
                 (F.col("obj") == F.col("ent"))
                 & (F.col("obj_type") == F.col("etype")),
                 "left_anti")
           .select("subj", "pred", "obj",
                   F.lit("range").alias("violation")))
    return dom.unionByName(rng).distinct()


def shacl_validate(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """SHACL-core-subset shape validation -> one row per violation:
    (shape_id, focus, path, violation, value).

    ``shapes`` is the shapes graph flattened to one property shape per
    row — the W3C SHACL core constraints this string-valued KG can
    express:

    * ``shape_id`` — report key (sh:PropertyShape identity);
    * ``target_class`` — focus nodes are the entities with
      ``instance_of`` = target_class (sh:targetClass);
    * ``path`` — the constrained predicate (sh:path, single forward
      predicate);
    * ``min_count`` / ``max_count`` — cardinality over the focus node's
      ``path`` triples, NULL = unconstrained (sh:minCount/sh:maxCount;
      a focus node with ZERO path triples violates min_count >= 1 —
      the left-join-and-coalesce below, SHACL's own semantics);
    * ``pattern`` — every value must match the regex
      (sh:pattern; confined to the Java-regex ∩ RE2 dialect
      intersection, the operators/pii.py discipline, so the DuckDB
      oracle replays it verbatim);
    * ``in_list`` (array<string>) — every value must be enumerated
      (sh:in).

    ``violation`` is one of min_count / max_count / pattern / in;
    cardinality rows carry the offending COUNT in ``value``,
    value-level rows the offending value — one row per failure, so a
    triple breaking pattern AND in reports twice (conformance report
    granularity, sh:ValidationResult per constraint component).

    Scale shape: shapes are ontology-sized — always broadcast; focus
    selection is one join against the pushed ``instance_of``
    projection; cardinality is one (focus, shape) partial-agg count
    left-joined back to targets (zero-count nodes included); the
    value checks are per-row predicates on the (focus, shape)-joined
    path triples. Everything shuffles on the focus entity; no
    corpus-side Python.
    """
    types = (triples.filter(F.col("pred") == "instance_of")
             .select(F.col("subj").alias("focus"),
                     F.col("obj").alias("etype")).distinct())
    sh = F.broadcast(shapes)

    # focus nodes per shape
    targets = (types.join(sh, types.etype == sh.target_class)
               .select("shape_id", "focus", "path",
                       "min_count", "max_count", "pattern", "in_list"))

    # the focus node's path triples, shape-joined; the RDF graph is a
    # SET, so evidence-duplicated (s, p, o) rows collapse before counts
    vals = (targets.join(
        triples.select(F.col("subj").alias("focus"),
                       F.col("pred").alias("path"), "obj").distinct(),
        ["focus", "path"], "left"))

    counts = (vals.groupBy("shape_id", "focus", "path",
                           "min_count", "max_count")
              .agg(F.sum(F.when(F.col("obj").isNotNull(), 1)
                         .otherwise(0)).cast("long").alias("n")))
    mincnt = (counts.filter(F.col("min_count").isNotNull()
                            & (F.col("n") < F.col("min_count")))
              .select("shape_id", "focus", "path",
                      F.lit("min_count").alias("violation"),
                      F.col("n").cast("string").alias("value")))
    maxcnt = (counts.filter(F.col("max_count").isNotNull()
                            & (F.col("n") > F.col("max_count")))
              .select("shape_id", "focus", "path",
                      F.lit("max_count").alias("violation"),
                      F.col("n").cast("string").alias("value")))

    present = vals.filter(F.col("obj").isNotNull())
    pat = (present.filter(F.col("pattern").isNotNull()
                          & ~F.expr("regexp_like(obj, pattern)"))
           .select("shape_id", "focus", "path",
                   F.lit("pattern").alias("violation"),
                   F.col("obj").alias("value")))
    inl = (present.filter(F.col("in_list").isNotNull()
                          & ~F.array_contains(F.col("in_list"),
                                              F.col("obj")))
           .select("shape_id", "focus", "path",
                   F.lit("in").alias("violation"),
                   F.col("obj").alias("value")))

    return (mincnt.unionByName(maxcnt).unionByName(pat)
            .unionByName(inl).distinct())
