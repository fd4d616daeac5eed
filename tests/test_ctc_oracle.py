"""Gates for the DuckDB CTC oracle (kernel/ctc_oracle.py, VERDICT r4 #5).

The driver compares Spark's ctc_predict against this SQL bitwise on
(token, ctc) — integers — so the only way the engines can disagree is an
argmax flip. These gates pin (a) the SQL replay equals the Python kernel's
predict() token-for-token on the real sf0.01 universe, (b) the minimum
decision margin is orders of magnitude above cross-engine float noise,
(c) the universe exclusion really is a superset of URL-rule tokens.
"""

import os

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_rows():
    import __spark_entry__ as E
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in ("documents", "events", "part"):
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(E._ctc_predict_oracle_sql()).fetchall()


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata absent")
def test_duckdb_replay_matches_kernel_predict(oracle_rows):
    import __spark_entry__ as E
    from stackoverflowner_spark.operators.ctcop import fit_ctc

    assert len(oracle_rows) > 150  # non-vacuous universe
    toks = [r[0] for r in oracle_rows]
    art = fit_ctc(E._CTC_NATURAL, E._CTC_CODE)
    pred = art.predict(toks)
    assert [int(p) for p in pred] == [r[1] for r in oracle_rows]
    # both classes represented, so a constant-output model can't pass
    vals = {r[1] for r in oracle_rows}
    assert vals == {0, 1}


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata absent")
def test_decision_margins_dwarf_cross_engine_noise(oracle_rows):
    """Cross-engine float noise (summation order, libm ulps, the tanh
    identity) is ~1e-12 on the logits; an argmax flip needs a token whose
    margin is below that. Gate the minimum margin at 1e-6."""
    import __spark_entry__ as E
    from stackoverflowner_spark.kernel.ctc import hashed_embedding
    from stackoverflowner_spark.operators.ctcop import fit_ctc

    toks = [r[0] for r in oracle_rows]
    art = fit_ctc(E._CTC_NATURAL, E._CTC_CODE)
    binned = art.binner.transform(art.raw_features(toks), art.N_FEATURES)
    h = np.tanh(binned @ art.model.w1 + art.model.b1)
    z = (np.concatenate([h, hashed_embedding(toks)], axis=1)
         @ art.model.w2 + art.model.b2)
    assert float(np.abs(z[:, 1] - z[:, 0]).min()) > 1e-6


def test_universe_excludes_every_url_rule_token(oracle_rows):
    """The exclusion predicate must be a SUPERSET of is_url_token matches
    (the one rule DuckDB's RE2 cannot replay): no sampled token may trip
    it, and known URL shapes must be excluded."""
    import re

    from stackoverflowner_spark.kernel.ctc import is_url_token
    from stackoverflowner_spark.kernel.ctc_oracle import (ASCII_PATTERN,
                                                          _url_core_pattern)

    for tok, _ in oracle_rows:
        assert not is_url_token(tok), tok
        assert re.match(ASCII_PATTERN, tok)

    core = re.compile(_url_core_pattern())

    def excluded(t):
        return (":" in t or "/" in t or "www" in t or "^" in t or "$" in t
                or not re.match(ASCII_PATTERN, t) or core.search(t))

    for t in ["http://x.com", "www.foo.org", "foo.com", "a.b.co.uk",
              "stackoverflow.com/q/1", "x.aspx", "sub.domain.net"]:
        assert is_url_token(t) and excluded(t), t
    # and the superset property on anything URL-ish the tokenizer emits
    for t in ["np.sum", "v1.2.3", "x=1", "3.14", "data-set", "httpclient"]:
        assert not is_url_token(t) and not excluded(t), t
