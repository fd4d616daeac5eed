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
