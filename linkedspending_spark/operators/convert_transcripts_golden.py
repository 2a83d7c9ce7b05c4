"""Independent pure-Python re-derivation of the transcript→triple rules.

This is the *golden oracle* for the flagship converter: a second,
row-at-a-time implementation of the SURVEY.md §1.4/§2 rules (URI
minting, literal lexical forms, component triples, mention linking,
completeness/refYear aggregates) written without Spark, mirroring how
the reference's single-threaded ``ConvertWorker`` walks entries
(ConvertWorker.java:580-843). Tests compare the distributed pipeline's
triple set against this with set precision/recall (target ≥0.95; exact
at fixture scale).

Deliberately uses its own string literals (not the ``uris``/``model``
helpers) so a minting bug in the engine cannot cancel out.
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

INST = "http://linkedspending.aksw.org/instance/"
ONT = "http://linkedspending.aksw.org/ontology/"
QB = "http://purl.org/linked-data/cube#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
DCT = "http://purl.org/dc/terms/"
SDMX = "http://purl.org/linked-data/sdmx/2009/attribute#"
DBO = "http://dbpedia.org/ontology/"

_TOKEN_RE = re.compile(r"[^a-zA-Z]+")


def _clean(v) -> str | None:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    s = str(v)
    if s.strip() in ("", "null"):
        return None
    return s


def _fmt6(x: float) -> str:
    # Java String.format("%.6f") rounds HALF_UP on the decimal expansion.
    return str(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def golden_triples(
    transcripts: pd.DataFrame,
    currency_map: dict[str, str],
    country_map: dict[str, str],
) -> set[tuple[str, str, str]]:
    """(s, p, o) set expected from the converter for the given input."""
    out: set[tuple[str, str, str]] = set()
    for conv_id, grp in transcripts.groupby("conv_id"):
        ds = INST + conv_id
        dsd = ds + "/model"
        out.add((ds, RDF + "type", QB + "DataSet"))
        out.add((ds, QB + "structure", dsd))
        out.add((ds, RDFS + "label", conv_id))
        out.add((ds, ONT + "transformationVersion", "4"))
        out.add((dsd, RDF + "type", QB + "DataStructureDefinition"))
        out.add((dsd, QB + "component", ONT + "DateComponentSpecification"))
        roles = {
            "role": ("dimension", "DimensionProperty"),
            "text": ("attribute", "AttributeProperty"),
            "tool": ("attribute", "AttributeProperty"),
        }
        for field, (role_prop, prop_class) in roles.items():
            prop = f"{ONT}{conv_id}-{field}"
            spec = prop + "-spec"
            out.add((dsd, QB + "component", spec))
            out.add((spec, RDF + "type", QB + "ComponentSpecification"))
            out.add((spec, QB + role_prop, prop))
            out.add((prop, RDF + "type", QB + prop_class))
            out.add((prop, RDFS + "label", field))

        missing = 0
        years = set()
        n = len(grp)
        for _, row in grp.iterrows():
            idx = int(row["turn_idx"])
            obs = f"{INST}observation-{conv_id}-{idx}"
            out.add((obs, RDF + "type", QB + "Observation"))
            out.add((obs, QB + "dataSet", ds))
            out.add((obs, RDFS + "label", f"{conv_id} turn {idx}"))
            out.add((obs, DCT + "source", f"{INST}source-{conv_id}-{idx}"))
            for field in ("role", "text"):
                v = row[field]
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    missing += 1
                else:
                    out.add((obs, f"{ONT}{conv_id}-{field}", str(v)))
            tool = _clean(row["tool"])
            if tool is None:
                missing += 1
            else:
                out.add((obs, f"{ONT}{conv_id}-tool", tool))
            ts = row["ts"]
            if ts is None or pd.isna(ts):
                missing += 1
            else:
                out.add(
                    (obs, ONT + "refDate", pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ"))
                )
                years.add(pd.Timestamp(ts).year)
            text = row["text"]
            if text is not None and not (isinstance(text, float) and pd.isna(text)):
                for tok in set(_TOKEN_RE.split(str(text))):
                    if tok in currency_map:
                        out.add((obs, DBO + "currency", currency_map[tok]))
                    if tok in country_map:
                        out.add((obs, SDMX + "refArea", country_map[tok]))
        out.add((ds, ONT + "completeness", _fmt6(1.0 - missing / (4 * n))))
        for y in years:
            out.add((ds, ONT + "refYear", f"{y:04d}"))
    return out
