"""End-to-end training-data curation pipeline over a documents table.

Composes the individually-oracled building blocks into the flow a real
LLM-data pipeline runs before training (each stage is the operator already
verified against DuckDB in the driver contract):

    lang-ID filter  ->  quality filter  ->  exact dedup  ->  MinHash/LSH
    near-dup clustering  ->  deterministic train/val/test split

Scale shape: every stage is declarative DataFrame work — the only shuffles
are the exact-dedup groupBy, the MinHash agg + band self-join, the
connected-components iterations over the (tiny) verified-pair graph, and
nothing corpus-sized ever reaches the driver. Decisions are pure functions
of content (md5 keys, seeded hashes), so a resumed or backfilled run makes
identical choices — the property that keeps incremental crawls consistent.

Every drop is attributable: ``curation_report`` returns one row per stage
with rows-in/rows-out, the same no-silent-drops discipline as the page
kernel's ok/err rows. ``curate_with_report`` shares ONE near-dup pass
between the curated output and the report (the persisted stage frontiers),
so curate+report costs one pipeline execution, not two.

``minhash_impl`` selects the near-dup stage: ``"fast"`` (default) is the
JVM xxhash64 MinHash scale path; ``"md5"`` is the engine-portable MinHash
twin every other engine (DuckDB oracle included) can replay bit-for-bit
(the two are recall/containment-gated against each other in
tests/test_dedup_fast.py); ``"simhash"`` swaps the whole
MinHash/LSH/Jaccard block for banded-Hamming simhash pairs (exact recall
by pigeonhole, oracled as `simhash_pairs`).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (exact_dedup, lsh_candidate_pairs, minhash_signatures,
                    minhash_signatures_fast, ngram_jaccard_pairs,
                    simhash_pairs)
from .sampling import dedup_clusters, hash_split
from .textstats import with_lang_id, with_quality_score

DEFAULT_SPLITS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]


def _stage_frontiers(docs: DataFrame, lang: str, min_quality: float,
                     shingle_n: int, minhash_k: int, rows_per_band: int,
                     jaccard_threshold: float, id_col: str, text_col: str,
                     minhash_impl: str, simhash_bands: int = 4,
                     simhash_max_hamming: int = 3) -> Dict[str, DataFrame]:
    """The shared stage frontiers of the curation DAG (all lazy)."""
    scored = with_quality_score(with_lang_id(docs, text_col), text_col)
    lang_kept = scored.filter(F.col("lang_pred") == lang)
    q_kept = lang_kept.filter(F.col("quality") >= min_quality)
    keepers = exact_dedup(q_kept, id_col, text_col).select(
        F.col("keep_id").alias(id_col))
    # e_kept feeds four consumers (signatures, jaccard shingles, cluster
    # ids, the survivor semi-join); truncate its lineage once so the
    # lang/quality/exact-dedup chain executes one time, not once per
    # consumer. At real scale this is a staged parquet write (exactly what
    # plans/pipeline.py does between kernel stages); in-session,
    # localCheckpoint is the same cut without a sink path.
    e_kept = q_kept.join(keepers, id_col, "left_semi").localCheckpoint()
    if minhash_impl == "simhash":
        # alternative near-dup stage: banded-Hamming simhash pairs (exact
        # recall by pigeonhole, driver-oracled as `simhash_pairs`) — one
        # fingerprint agg + block self-join instead of MinHash signatures +
        # band join + Jaccard verification. Cheaper at scale (no k-way
        # signature fanout), coarser notion of similarity (bit distance on
        # the sign-aggregated word-hash fingerprint).
        verified = simhash_pairs(e_kept, id_col, text_col,
                                 bands=simhash_bands,
                                 max_hamming=simhash_max_hamming)
    else:
        sig_fn = {"fast": minhash_signatures_fast,
                  "md5": minhash_signatures}[minhash_impl]
        sig = sig_fn(e_kept, id_col, text_col, n=shingle_n, k=minhash_k)
        cands = lsh_candidate_pairs(sig, id_col, rows_per_band)
        verified = ngram_jaccard_pairs(e_kept, cands, id_col, text_col,
                                       n=shingle_n,
                                       threshold=jaccard_threshold)
    clusters = dedup_clusters(verified, e_kept.select(id_col), id_col)
    survivors = e_kept.join(clusters.filter(F.col("is_dup") == 0)
                            .select(id_col), id_col, "left_semi")
    return {"lang_kept": lang_kept, "q_kept": q_kept, "e_kept": e_kept,
            "clusters": clusters, "survivors": survivors}


def curate_documents(docs: DataFrame, lang: str = "en",
                     min_quality: float = 0.3, shingle_n: int = 3,
                     minhash_k: int = 8, rows_per_band: int = 2,
                     jaccard_threshold: float = 0.7,
                     splits=None, id_col: str = "doc_id",
                     text_col: str = "text",
                     minhash_impl: str = "fast", simhash_bands: int = 4,
                     simhash_max_hamming: int = 3) -> DataFrame:
    """documents -> curated rows with a ``split`` column.

    Returns (id_col, text_col, lang_pred, quality, split) for the surviving
    documents. Stage-by-stage:

    1. language filter on the predicted language (not the stored column —
       crawls lie) — `with_lang_id`, pure column expressions;
    2. quality floor — `with_quality_score`;
    3. exact dedup: keep the min id per identical normalized text;
    4. near-dup removal: MinHash -> LSH banding -> exact n-gram Jaccard
       verification -> connected components -> keep cluster min;
    5. deterministic hash split (backfill-stable).
    """
    splits = splits or DEFAULT_SPLITS
    f = _stage_frontiers(docs, lang, min_quality, shingle_n, minhash_k,
                         rows_per_band, jaccard_threshold, id_col, text_col,
                         minhash_impl, simhash_bands, simhash_max_hamming)
    return hash_split(f["survivors"], splits, id_col).select(
        id_col, text_col, "lang_pred", "quality", "split")


def _report_rows(docs: DataFrame, f: Dict[str, DataFrame]
                 ) -> List[Tuple[str, int, int]]:
    n0 = docs.count()
    n1 = f["lang_kept"].count()
    n2 = f["q_kept"].count()
    n3 = f["e_kept"].count()
    n4 = f["clusters"].filter(F.col("is_dup") == 0).count()
    return [("lang_filter", n0, n1), ("quality_filter", n1, n2),
            ("exact_dedup", n2, n3), ("near_dup", n3, n4)]


def _report_df(spark, rows: List[Tuple[str, int, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(s, a, b, a - b) for s, a, b in rows],
        "stage string, rows_in long, rows_out long, dropped long")


def curation_report(docs: DataFrame, lang: str = "en",
                    min_quality: float = 0.3, shingle_n: int = 3,
                    minhash_k: int = 8, rows_per_band: int = 2,
                    jaccard_threshold: float = 0.7,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    minhash_impl: str = "fast", simhash_bands: int = 4,
                    simhash_max_hamming: int = 3) -> DataFrame:
    """One row per curation stage: (stage, rows_in, rows_out, dropped).

    Each stage count anti-joins nothing and samples nothing — every dropped
    document is attributable to exactly one stage. Use
    ``curate_with_report`` when the curated rows are also needed; this
    standalone form runs the stage DAG for the counts only.
    """
    f = _stage_frontiers(docs, lang, min_quality, shingle_n, minhash_k,
                         rows_per_band, jaccard_threshold, id_col, text_col,
                         minhash_impl, simhash_bands, simhash_max_hamming)
    e_kept = f["e_kept"].persist()
    try:
        rows = _report_rows(docs, f)
    finally:
        e_kept.unpersist(blocking=False)
    return _report_df(docs.sparkSession, rows)


def curate_with_report(docs: DataFrame, lang: str = "en",
                       min_quality: float = 0.3, shingle_n: int = 3,
                       minhash_k: int = 8, rows_per_band: int = 2,
                       jaccard_threshold: float = 0.7,
                       splits=None, id_col: str = "doc_id",
                       text_col: str = "text",
                       minhash_impl: str = "fast",
                       materialize=None) -> DataFrame:
    """Run curation ONCE and return the report; ``materialize(curated)``
    (e.g. a parquet write) consumes the curated rows from the same persisted
    frontiers, so the expensive near-dup stage never executes twice."""
    splits = splits or DEFAULT_SPLITS
    f = _stage_frontiers(docs, lang, min_quality, shingle_n, minhash_k,
                         rows_per_band, jaccard_threshold, id_col, text_col,
                         minhash_impl)
    # e_kept feeds three consumers (count, signatures via clusters,
    # survivors); clusters feeds the near-dup count and the survivor
    # semi-join. Persisting both makes every count and the curated output
    # read the one materialized pass.
    e_kept = f["e_kept"].persist()
    clusters = f["clusters"].persist()
    f = dict(f, e_kept=e_kept, clusters=clusters)
    survivors = e_kept.join(clusters.filter(F.col("is_dup") == 0)
                            .select(id_col), id_col, "left_semi")
    try:
        rows = _report_rows(docs, f)
        if materialize is not None:
            curated = hash_split(survivors, splits, id_col).select(
                id_col, text_col, "lang_pred", "quality", "split")
            materialize(curated)
    finally:
        e_kept.unpersist(blocking=False)
        clusters.unpersist(blocking=False)
    return _report_df(docs.sparkSession, rows)
