"""S1 Posts.xml source: end-to-end through the Spark path, gated on the
reference's shipped goldens (Posts_Small.xml -> text_files/<post_id>.txt)."""

import os

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.sources.posts_xml import (
    posts_as_pages, posts_final_text, posts_xml)

REF = "/root/reference/code/DataReader"
XML = os.path.join(REF, "Posts_Small.xml")


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-posts", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.mark.skipif(not os.path.exists(XML), reason="reference fixture absent")
def test_posts_xml_parse_and_parent_child_ids(spark):
    rows = {r.post_id: r for r in posts_xml(spark, XML).collect()}
    assert "13347179" in rows and rows["13347179"].post_type_id == "1"
    # answer 1533 to question 1528 -> parent_child id
    assert "1528_1533" in rows
    assert rows["1528_1533"].parent_id == "1528"
    assert rows["1528_1533"].raw_id == "1533"
    # Body is unescaped HTML
    assert rows["13347179"].body.startswith("<p>There are many folks")


@pytest.mark.skipif(not os.path.exists(XML), reason="reference fixture absent")
def test_posts_xml_reproduces_reference_goldens_end_to_end(spark):
    """The whole Spark path (read.text -> XML parse -> kernel) must emit
    text byte-identical to the reference pipeline's shipped text_files/."""
    out = {r.post_id: r.final_text
           for r in posts_final_text(posts_xml(spark, XML)).collect()}
    checked = 0
    for pid, final in out.items():
        golden = os.path.join(REF, "text_files", f"{pid}.txt")
        if not os.path.exists(golden):
            continue
        assert final == open(golden).read(), pid
        checked += 1
    assert checked >= 3


@pytest.mark.skipif(not os.path.exists(XML), reason="reference fixture absent")
def test_posts_as_pages_feeds_the_kernel(spark):
    from stackoverflowner_spark.operators.document_kernel import (
        pages_to_mentions_fused)
    from stackoverflowner_spark.operators.tagger import GazetteerTagger
    pages = posts_as_pages(posts_xml(spark, XML))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    mentions = pages_to_mentions_fused(pages, GazetteerTagger())
    got = {r.surface_norm for r in mentions.collect()}
    assert got, "post bodies must yield mentions"
    urls = {r.url for r in pages.select("url").collect()}
    assert "so://post/1528_1533" in urls

def test_malformed_lines_surface_as_err_rows_not_silent_drops(spark, tmp_path):
    """ADVICE r02: a dump-scale ingest must keep lineage over every input
    line — malformed XML becomes an ok=false row carrying the error, and
    the page adapter filters it out without losing the count."""
    p = str(tmp_path / "posts.xml")
    with open(p, "w") as f:
        f.write('<posts>\n'
                '<row Id="1" PostTypeId="1" Body="&lt;p&gt;ok&lt;/p&gt;" />\n'
                '<row Id="2" PostTypeId="1" Body="broken &lt; unclosed\n'
                '<row Id="3" PostTypeId="2" ParentId="1" Body="&lt;p&gt;a&lt;/p&gt;" />\n'
                '</posts>\n')
    rows = posts_xml(spark, p).collect()
    ok = [r for r in rows if r.ok]
    err = [r for r in rows if not r.ok]
    assert {r.post_id for r in ok} == {"1", "1_3"}
    assert len(err) == 1 and err[0].err.startswith("xml:")
    # adapters keep only parsed rows but the err row stayed countable above
    assert posts_as_pages(posts_xml(spark, p)).count() == 2
