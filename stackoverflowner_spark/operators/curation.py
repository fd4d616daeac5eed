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
kernel's ok/err rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (exact_dedup, lsh_candidate_pairs, minhash_signatures_fast,
                    ngram_jaccard_pairs)
from .sampling import dedup_clusters, hash_split
from .textstats import with_lang_id, with_quality_score

DEFAULT_SPLITS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]


def curate_documents(docs: DataFrame, lang: str = "en",
                     min_quality: float = 0.3, shingle_n: int = 3,
                     minhash_k: int = 8, rows_per_band: int = 2,
                     jaccard_threshold: float = 0.7,
                     splits=None, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """documents -> curated rows with a ``split`` column.

    Returns (id_col, text_col, lang_pred, quality, split) for the surviving
    documents. Stage-by-stage:

    1. language filter on the predicted language (not the stored column —
       crawls lie) — `with_lang_id`, pure column expressions;
    2. quality floor — `with_quality_score`;
    3. exact dedup: keep the min id per identical normalized text;
    4. near-dup removal: xxhash64 MinHash -> LSH banding -> exact n-gram
       Jaccard verification -> connected components -> keep cluster min
       (the scale twin is used here; the md5 twin is the oracle path and
       the two are recall-gated against each other in tests);
    5. deterministic hash split (backfill-stable).
    """
    splits = splits or DEFAULT_SPLITS
    scored = with_quality_score(with_lang_id(docs, text_col), text_col)
    kept = scored.filter((F.col("lang_pred") == lang)
                         & (F.col("quality") >= min_quality))

    keepers = exact_dedup(kept, id_col, text_col).select(
        F.col("keep_id").alias(id_col))
    kept = kept.join(keepers, id_col, "left_semi")

    sig = minhash_signatures_fast(kept, id_col, text_col,
                                  n=shingle_n, k=minhash_k)
    cands = lsh_candidate_pairs(sig, id_col, rows_per_band)
    verified = ngram_jaccard_pairs(kept, cands, id_col, text_col,
                                   n=shingle_n, threshold=jaccard_threshold)
    clusters = dedup_clusters(verified, kept.select(id_col), id_col)
    kept = kept.join(clusters.filter(F.col("is_dup") == 0)
                     .select(id_col), id_col, "left_semi")

    return hash_split(kept, splits, id_col).select(
        id_col, text_col, "lang_pred", "quality", "split")


def curation_report(docs: DataFrame, lang: str = "en",
                    min_quality: float = 0.3, shingle_n: int = 3,
                    minhash_k: int = 8, rows_per_band: int = 2,
                    jaccard_threshold: float = 0.7,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """One row per curation stage: (stage, rows_in, rows_out, dropped).

    Recomputes the stage frontiers (cheap at report time; a production run
    would observe() them inline) so every dropped document is attributable
    to exactly one stage.
    """
    scored = with_quality_score(with_lang_id(docs, text_col), text_col)
    n0 = docs.count()
    lang_kept = scored.filter(F.col("lang_pred") == lang)
    n1 = lang_kept.count()
    q_kept = lang_kept.filter(F.col("quality") >= min_quality)
    n2 = q_kept.count()
    keepers = exact_dedup(q_kept, id_col, text_col).select(
        F.col("keep_id").alias(id_col))
    e_kept = q_kept.join(keepers, id_col, "left_semi")
    n3 = e_kept.count()
    sig = minhash_signatures_fast(e_kept, id_col, text_col,
                                  n=shingle_n, k=minhash_k)
    cands = lsh_candidate_pairs(sig, id_col, rows_per_band)
    verified = ngram_jaccard_pairs(e_kept, cands, id_col, text_col,
                                   n=shingle_n, threshold=jaccard_threshold)
    clusters = dedup_clusters(verified, e_kept.select(id_col), id_col)
    n4 = clusters.filter(F.col("is_dup") == 0).count()
    spark = docs.sparkSession
    rows = [("lang_filter", n0, n1), ("quality_filter", n1, n2),
            ("exact_dedup", n2, n3), ("near_dup", n3, n4)]
    return spark.createDataFrame(
        [(s, a, b, a - b) for s, a, b in rows],
        "stage string, rows_in long, rows_out long, dropped long")
