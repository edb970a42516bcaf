"""Property test for the integer-scaled quality columns.

The quality/repetition/corpus-filter queries rely on every ratio being
computed as ``numerator * 10^6 DIV denominator`` in int64 so Spark and the
DuckDB oracle agree bit-for-bit (multi-term float forms drift by 1 ulp
between engines — found by the sf0.1 parity sweep). This test pins the
Spark implementation to a pure-Python model of that integer contract, so a
future edit that quietly reintroduces float arithmetic fails here before it
reaches the driver gate.

ASCII-only strategy: Spark's regex/length semantics match Python's on
ASCII; Unicode classes differ by design (see test_clean_properties.py).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nfl_data_engineering_spark.functions.text import STOPWORDS
from nfl_data_engineering_spark.plans.textops import _quality_scaled_cols


def model_quality(text: str) -> dict:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    nc = len(text)
    nt = len(toks)
    np_ = nc - len(re.sub(r"[^\w\s]", "", text, flags=re.ASCII))
    ns = sum(1 for t in toks if t in STOPWORDS)
    tc = sum(len(t) for t in toks)
    nd = len(set(toks))
    punct_ppm = (np_ * 1000000) // nc if nc > 0 else 0
    stop_ppm = (ns * 1000000) // nt if nt > 0 else 0
    mwl_ppm = (tc * 1000000) // nt if nt > 0 else 0
    rep_ppm = ((nt - nd) * 1000000) // nt if nt > 0 else None
    score_ppm = (2500 * min(nt, 100)
                 + (250000 - punct_ppm // 4)
                 + min(stop_ppm, 250000)
                 + min(mwl_ppm // 32, 250000))
    return dict(nc=nc, nt=nt, punct_ppm=punct_ppm, stop_ppm=stop_ppm,
                mwl_ppm=mwl_ppm, rep_ppm=rep_ppm, score_ppm=score_ppm)


word = st.one_of(
    st.sampled_from(STOPWORDS),
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=8))
doc_text = st.lists(word, min_size=0, max_size=20).map(" ".join)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(doc_text, min_size=1, max_size=30))
def test_quality_scaled_matches_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id bigint, text string, source string")
    got = {r["doc_id"]: r.asDict()
           for r in _quality_scaled_cols(df).collect()}
    for i, t in enumerate(texts):
        want = model_quality(t)
        g = got[i]
        for k, v in want.items():
            assert g[k] == v, (t, k, g[k], v)
