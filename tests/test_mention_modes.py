"""Native (broadcast token join) vs pandas (Arrow UDF) mention paths.

On code-only fixture text the two modes must emit the IDENTICAL mention
triple set; on multi-word surface forms ("Swiss franc") only the pandas
detector matches — the reason the fuzzy path exists.
"""

from __future__ import annotations

import pandas as pd

from linkedspending_spark import model as M
from linkedspending_spark.operators.convert_transcripts import convert_transcripts
from linkedspending_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_df


def _mentions(df):
    return {
        (r["s"], r["p"], r["o"])
        for r in df.collect()
        if r["p"] in (M.DBO_CURRENCY, M.SDMX_REF_AREA)
    }


def test_pandas_mode_equals_native_on_codes(spark):
    t = synth_transcripts_df(spark, n_convs=8, base_turns=5, seed=11)
    native = _mentions(convert_transcripts(spark, t, mention_mode="native"))
    fuzzy = _mentions(convert_transcripts(spark, t, mention_mode="pandas"))
    assert native and native == fuzzy


def test_pandas_mode_matches_multiword_surface_forms(spark):
    rows = pd.DataFrame(
        [
            {
                "conv_id": "c1",
                "turn_idx": 0,
                "role": "user",
                "text": "paid in Swiss franc while visiting the United Kingdom",
                "tool": None,
                "ts": pd.Timestamp("2013-01-01"),
            }
        ]
    )
    t = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    native = _mentions(convert_transcripts(spark, t, mention_mode="native"))
    fuzzy = _mentions(convert_transcripts(spark, t, mention_mode="pandas"))
    objs = {o for _s, _p, o in fuzzy}
    assert any(o.endswith("/Swiss_franc") for o in objs)
    assert any(o.endswith("/United_Kingdom") for o in objs)
    # the token join cannot see multi-word forms
    assert not any(o.endswith("/Swiss_franc") for _s, _p, o in native)
