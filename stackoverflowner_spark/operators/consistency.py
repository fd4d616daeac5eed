"""Document-level label-consistency as a declarative Spark operator.

The production hot path applies kernel/docconsist.py INSIDE the fused
``pages_to_mentions_fused`` page loop — a page is a document, so the pass
rides the existing single ``mapInPandas`` with zero extra shuffle. This
module is the declarative twin for the modular/checkpointed path, where
tagged tokens are already materialized as a long table and the pass should
run engine-side (window + aggregate + join, all JVM, WholeStageCodegen)
instead of re-crossing into Python.

Semantics are the kernel's, restated relationally (parity-gated in
tests/test_consistency.py):

* votes  — single-token B- chunks whose surface passes the name-shape gate
           vote (url, token) -> entity type, one vote per mention;
* majority — the top-voted type per (url, token), dropped on ties or when
           below ``min_votes``;
* propagate — O tokens matching a voted surface (exact case) inherit
           ``B-<type>``; existing chunks are never touched.

Scale shape: the vote aggregate shuffles O(mentions) rows (mentions, not
tokens — the single-token filter happens before the exchange), and the
relabel join shuffles O(distinct voted surfaces) against the token table
keyed by (url, token); both partition on the url-prefixed key, so document
locality is preserved and no key can exceed one document's token count.

The shape gate's regex restatement uses Unicode classes (``\\p{Lu}`` /
``\\p{Nd}`` — supported by both Java regex and DuckDB's RE2) to track
Python's ``isupper``/``isdigit``; the only divergence is exotic cased
letters outside Lu (titlecase digraphs), which the parity test corpus
exercises on the ASCII identifier surfaces the gate exists for. The kernel
pass remains the authority inside the fused path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# kernel/docconsist.py name_like: len >= 2, has an alphanumeric, and has an
# uppercase/digit/identifier char. Regex restatement for the JVM/SQL twin
# (parameterized on the column name; see NAME_LIKE_SQL).
NAME_LIKE_SQL = (
    "length({c}) >= 2 and {c} rlike '[\\\\p{{L}}\\\\p{{Nd}}]' "
    "and {c} rlike '[\\\\p{{Lu}}\\\\p{{Nd}}._/-]'"
)
_NAME_LIKE = NAME_LIKE_SQL.format(c="token")


def consistency_votes(tokens: DataFrame, min_votes: int = 1) -> DataFrame:
    """Majority entity label per (url, token) from single-token mentions.

    ``tokens``: one row per token — (url, sent_idx, pos, token, tag) with
    BIO tags. Returns (url, token, tag_type, votes) for surfaces that won
    an untied majority with at least ``min_votes`` mentions.
    """
    w = Window.partitionBy("url", "sent_idx").orderBy("pos")
    nxt = F.lead("tag").over(w)
    single = (
        tokens
        .withColumn("_nxt", nxt)
        .filter(F.col("tag").startswith("B-")
                & (F.col("_nxt").isNull() | ~F.col("_nxt").startswith("I-")))
        .filter(F.expr(_NAME_LIKE))
        .select("url", "token",
                F.expr("substring(tag, 3)").alias("tag_type"))
    )
    votes = single.groupBy("url", "token", "tag_type").agg(
        F.count("*").alias("votes"))
    rk = Window.partitionBy("url", "token")
    top = F.max("votes").over(rk)
    n_at_top = F.sum(F.when(F.col("votes") == F.col("_top"), 1)
                     .otherwise(0)).over(rk)
    return (votes
            .withColumn("_top", top)
            .withColumn("_n_top", n_at_top)
            .filter((F.col("votes") == F.col("_top"))
                    & (F.col("_n_top") == 1)
                    & (F.col("votes") >= min_votes))
            .select("url", "token", "tag_type", "votes"))


def propagate_labels(tokens: DataFrame, min_votes: int = 1) -> DataFrame:
    """Kernel ``apply_consistency`` as a relational plan.

    Returns the token table with ``tag`` rewritten: O tokens whose surface
    won an in-document majority become single-token ``B-<type>`` chunks.
    """
    labels = consistency_votes(tokens, min_votes=min_votes).select(
        "url", "token", F.col("tag_type").alias("_prop_type"))
    return (tokens.join(labels, ["url", "token"], "left")
            .withColumn(
                "tag",
                F.when((F.col("tag") == "O") & F.col("_prop_type").isNotNull(),
                       F.concat(F.lit("B-"), F.col("_prop_type")))
                .otherwise(F.col("tag")))
            .drop("_prop_type"))


def propagate_mentions(mentions: DataFrame, tokens: DataFrame,
                       min_votes: int = 1) -> DataFrame:
    """Mention-level consistency for the modular/checkpointed path.

    ``mentions``: the MENTIONS_SCHEMA chunk table; ``tokens``: the long
    token table (url, sent_idx, pos, token). Single-token mentions whose
    surface passes the shape gate vote per document; uncovered token
    positions matching an untied majority surface become new single-token
    mentions. Returns mentions ∪ propagated, same schema — exactly the
    kernel ``doc_postpass`` run inside the fused path (parity-gated in
    tests/test_consistency.py on the full synthetic-pages corpus).

    Scale shape: votes aggregate O(single-token mentions); the candidate
    join keys on (url, token) against the small voted-label table BEFORE
    the coverage anti-join, so the range predicate only ever sees candidate
    rows, not the whole token table.
    """
    single = (mentions
              .filter((F.col("tok_end") - F.col("tok_start")) == 1)
              .filter(F.expr(NAME_LIKE_SQL.format(c="surface"))))
    votes = single.groupBy("url", "surface", "tag_type").agg(
        F.count("*").alias("votes"))
    rk = Window.partitionBy("url", "surface")
    labels = (votes
              .withColumn("_top", F.max("votes").over(rk))
              .withColumn("_n_top", F.sum(
                  F.when(F.col("votes") == F.col("_top"), 1)
                  .otherwise(0)).over(rk))
              .filter((F.col("votes") == F.col("_top"))
                      & (F.col("_n_top") == 1)
                      & (F.col("votes") >= min_votes))
              .select("url", F.col("surface").alias("token"),
                      F.col("tag_type").alias("_ptype")))
    cand = tokens.join(labels, ["url", "token"])
    m = mentions.select(
        F.col("url").alias("m_url"), F.col("sent_idx").alias("m_sidx"),
        "tok_start", "tok_end")
    uncovered = cand.join(
        m, (cand.url == m.m_url) & (cand.sent_idx == m.m_sidx)
        & (cand.pos >= m.tok_start) & (cand.pos < m.tok_end), "left_anti")
    new = uncovered.select(
        "url", "sent_idx",
        F.col("pos").alias("tok_start"),
        (F.col("pos") + 1).alias("tok_end"),
        F.col("token").alias("surface"),
        F.lower(F.col("token")).alias("surface_norm"),
        F.col("_ptype").alias("tag_type"))
    return mentions.unionByName(
        new.select(*mentions.columns)
        .withColumn("sent_idx", F.col("sent_idx").cast("int"))
        .withColumn("tok_start", F.col("tok_start").cast("int"))
        .withColumn("tok_end", F.col("tok_end").cast("int")))


_PUNCT = "=+-*/{}[]()<>;:,.!?|&^%$#@~`'\"\\"


def suppress_punct_mentions(mentions: DataFrame) -> DataFrame:
    """Declarative twin of kernel ``suppress_punct_code_spans`` over the
    MENTIONS table: drop Code_Block chunks whose surface is punctuation
    only (token separators are spaces, so all-punct tokens <=> the surface
    is punct+space only). ``translate`` keeps it in codegen — no regex."""
    all_punct = F.translate(F.col("surface"), _PUNCT + " ", "") == ""
    return mentions.filter(~((F.col("tag_type") == "Code_Block") & all_punct))
