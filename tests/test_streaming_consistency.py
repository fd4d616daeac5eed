"""Streaming triples with the doc-consistency flag == batch fused run.

The consistency pass is per-page state and a page row is whole within its
micro-batch, so threading the flag through start_triples_stream must not
open a batch/stream gap — with the learned default tagger, whose tags the
pass actually rewrites (the gazetteer is surface-deterministic, so 1-gram
propagation is vacuous there).
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from stackoverflowner_spark.operators import document_kernel as dk
from stackoverflowner_spark.operators.link import link_broadcast
from stackoverflowner_spark.operators.triples import triples_from_linked
from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.sources.dictionary import dictionary_df
from stackoverflowner_spark.sources.pages import synth_pages
from stackoverflowner_spark.streaming.ingest import start_triples_stream


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-stream-consist", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_with_consistency_matches_batch(spark, tmp_path):
    from stackoverflowner_spark.operators.tagger import default_tagger
    tagger = default_tagger()
    pages_dir = str(tmp_path / "pages")
    synth_pages(spark, 60).write.parquet(pages_dir)
    q = start_triples_stream(spark, pages_dir, str(tmp_path / "tri"),
                             str(tmp_path / "ckpt"), tagger=tagger,
                             doc_consistency=True)
    assert q.awaitTermination(300)
    tri = spark.read.parquet(str(tmp_path / "tri"))
    batch = triples_from_linked(link_broadcast(
        dk.pages_to_mentions_fused(spark.read.parquet(pages_dir), tagger,
                                   doc_consistency=True),
        dictionary_df(spark)))
    a = set(map(tuple, tri.select("subj", "pred", "obj", "url").collect()))
    b = set(map(tuple, batch.select("subj", "pred", "obj", "url").collect()))
    assert a == b and len(a) > 0
