"""The conversation-transcripts input surface (BASELINE.json input_hint).

Input shape: ``conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp``. One conversation plays the role of one
OpenSpending *dataset*, one turn the role of one *entry/observation*
(ResultsReader.java:26-37 ↔ one turn-row).

Two deterministic sources, no external data:

* :func:`synth_transcripts` — seeded pandas generator for pytest golden
  fixtures; plants currency/country entity mentions, NT-escaping hazards
  (quotes/newlines/backslash/unicode), null-ish ``tool`` values, and a
  mega-conversation hot key for skew tests.
* :data:`TRANSCRIPTS_FROM_EVENTS_SQL` — a portable (Spark **and** DuckDB)
  SQL derivation of a transcripts table from the driver's ``events``
  parquet, so oracle comparisons run on identical rows.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_ROLES = ["user", "assistant", "tool", "system"]
_CURRENCIES = ["EUR", "USD", "JPY", "GBP", "CHF"]
_COUNTRIES = ["de", "fr", "jp", "us", "gb"]
_TOOL_VALUES = [None, "null", "", "search", "code", "browse", "  "]
_HAZARDS = [
    'he said "hello"',
    "line1\nline2",
    "tab\there",
    "back\\slash",
    "café über ☃",
    "plain text",
]


def synth_transcripts(
    n_convs: int = 30,
    base_turns: int = 8,
    mega_conv_turns: int = 0,
    seed: int = 42,
) -> pd.DataFrame:
    """Seeded synthetic transcripts with plantable mentions and hazards.

    ``mega_conv_turns`` > 0 adds one hot conversation (``conv-mega``)
    with that many turns — the skew fixture (FIXTURES.md §1).
    """
    rng = random.Random(seed)
    rows = []
    convs = [(f"conv-{i:04d}", base_turns + rng.randrange(0, 5)) for i in range(n_convs)]
    if mega_conv_turns:
        convs.append(("conv-mega", mega_conv_turns))
    for conv_id, n_turns in convs:
        t0 = 1356998400 + rng.randrange(0, 10_000_000)  # 2013-01-01 epoch base
        for turn_idx in range(n_turns):
            cur = _CURRENCIES[rng.randrange(len(_CURRENCIES))]
            ctry = _COUNTRIES[rng.randrange(len(_COUNTRIES))]
            hazard = _HAZARDS[rng.randrange(len(_HAZARDS))]
            amount = rng.randrange(1, 100000)
            text = (
                f"turn {turn_idx}: paid {amount} {cur} in {ctry} — {hazard}"
            )
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": _ROLES[rng.randrange(len(_ROLES))],
                    "text": text,
                    "tool": _TOOL_VALUES[rng.randrange(len(_TOOL_VALUES))],
                    "ts": pd.Timestamp(t0 + turn_idx * 60, unit="s"),
                }
            )
    return pd.DataFrame(rows)


def synth_transcripts_df(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.createDataFrame(synth_transcripts(**kwargs), schema=TRANSCRIPT_SCHEMA)


# --- portable derivation from the driver's ``events`` table ----------------
# Strictly ANSI-portable subset: CASE (not element_at/list-index), row_number,
# decimal casts (double→varchar differs between engines, decimal does not).
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  CONCAT('conv-', CAST(user_id AS STRING))                       AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) - 1 AS INT)      AS turn_idx,
  CASE CAST(event_id % 4 AS INT)
    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
    WHEN 2 THEN 'tool' ELSE 'system' END                          AS role,
  CONCAT(event_type, ' paid ',
         CAST(CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS STRING), ' ',
         CASE CAST(event_id % 5 AS INT)
           WHEN 0 THEN 'EUR' WHEN 1 THEN 'USD' WHEN 2 THEN 'JPY'
           WHEN 3 THEN 'GBP' ELSE 'CHF' END,
         ' in ',
         CASE CAST(event_id % 6 AS INT)
           WHEN 0 THEN 'de' WHEN 1 THEN 'fr' WHEN 2 THEN 'jp'
           WHEN 3 THEN 'us' WHEN 4 THEN 'gb' ELSE 'ch' END)       AS text,
  CASE CAST(event_id % 7 AS INT)
    WHEN 0 THEN NULL WHEN 1 THEN 'null' WHEN 2 THEN ''
    WHEN 3 THEN 'search' WHEN 4 THEN 'code'
    WHEN 5 THEN 'browse' ELSE 'fetch' END                         AS tool,
  ts                                                              AS ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the portable derivation (events parquet → transcripts)."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    df = spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)
    return df.withColumn("turn_idx", df["turn_idx"].cast("int"))


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Schema-enforced transcript reader for the supported source formats.

    ``parquet`` (primary; Iceberg tables at deployment), ``json``
    (JSON-lines — the reference's native input shape,
    ResultsReader.java:26-37), ``csv`` (header row, ISO timestamps).
    The explicit schema keeps readers streaming (no inference pass) and
    guarantees the input_hint column types regardless of format.
    """
    if fmt == "parquet":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
    elif fmt == "csv":
        df = spark.read.schema(TRANSCRIPT_SCHEMA).option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported transcript format: {fmt!r}")
    return df
