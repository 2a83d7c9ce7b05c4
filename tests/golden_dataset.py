"""Independent pure-Python golden oracle for the OpenSpending-shaped
dataset converter — a second, row-at-a-time derivation of the rules
(ConvertWorker.java:173-300,580-843), written without the engine's
helpers so bugs cannot cancel out."""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

INST = "http://linkedspending.aksw.org/instance/"
ONT = "http://linkedspending.aksw.org/ontology/"
QB = "http://purl.org/linked-data/cube#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
DCT = "http://purl.org/dc/terms/"
SDMX = "http://purl.org/linked-data/sdmx/2009/attribute#"
DBO = "http://dbpedia.org/ontology/"
XSD = "http://www.w3.org/2001/XMLSchema#"

_TZ = re.compile(r"\+\d\d:\d\d")


def _clean(v):
    if v is None:
        return None
    s = str(v)
    return None if s.strip() in ("", "null") else s


def _fmt6(x: float) -> str:
    return str(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _parse_string_date(s):
    import datetime as dt

    s = _TZ.sub("", s)
    if len(s) == 10:
        s = s + "T00:00:00.00Z"
    try:
        return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


def classify(name, mtype, datatype):
    if name == "amount" or mtype == "measure":
        return "measure"
    if mtype == "compound":
        return "compound"
    if mtype == "date":
        return "date"
    if mtype == "attribute":
        if datatype == "string" and "date" in name:
            return "string_date"
        return "attribute"
    raise ValueError(mtype)


ROLE = {
    "date": ("dimension", "DimensionProperty"),
    "compound": ("dimension", "DimensionProperty"),
    "measure": ("measure", "MeasureProperty"),
    "attribute": ("attribute", "AttributeProperty"),
    "string_date": ("attribute", "AttributeProperty"),
}


def golden_dataset_triples(
    dataset: str,
    mapping_rows: list[dict],
    meta: dict,
    entries: list[dict],
    currency_map: dict[str, str],
    country_map: dict[str, str],
    prop_overrides: dict[tuple[str, str], str] | None = None,
) -> set[tuple[str, str, str]]:
    prop_overrides = prop_overrides or {}
    ds = INST + dataset
    dsd = ds + "/model"
    out: set[tuple[str, str, str]] = set()
    comps = []
    for row in mapping_rows:
        ct = classify(row["name"], row.get("type"), row.get("datatype"))
        uri = prop_overrides.get((dataset, row["name"])) or f"{ONT}{dataset}-{row['name']}"
        comps.append({**row, "ctype": ct, "uri": uri})

    out |= {
        (ds, RDF + "type", QB + "DataSet"),
        (ds, QB + "structure", dsd),
        (ds, DCT + "identifier", dataset),
        (ds, DBO + "currency", currency_map[meta["currency"]]),
        (dsd, RDF + "type", QB + "DataStructureDefinition"),
        (dsd, QB + "component", ONT + "CurrencyComponentSpecification"),
        (dsd, QB + "component", ONT + "DateComponentSpecification"),
        (dsd, QB + "component", ONT + "YearComponentSpecification"),
        (ds, ONT + "transformationVersion", "4"),
    }
    if meta.get("label"):
        out.add((ds, RDFS + "label", meta["label"]))
    if meta.get("description"):
        out.add((ds, RDFS + "comment", meta["description"]))
    default_year = None
    if meta.get("default_time"):
        try:
            default_year = int(meta["default_time"][:4])
            out.add((ds, ONT + "refYear", f"{default_year:04d}"))
        except ValueError:
            pass
    if meta.get("territories"):
        out.add((dsd, QB + "component", ONT + "CountryComponentSpecification"))
        for code in meta["territories"]:
            if code.lower() in country_map:
                out.add((ds, SDMX + "refArea", country_map[code.lower()]))

    xsd_by_dt = {
        "float": XSD + "float",
        "double": XSD + "double",
        "string": XSD + "string",
        "date": XSD + "date",
    }
    for c in comps:
        role_prop, prop_class = ROLE[c["ctype"]]
        spec = c["uri"] + "-spec"
        owl_kind = "ObjectProperty" if c["ctype"] == "compound" else "DatatypeProperty"
        out |= {
            (dsd, QB + "component", spec),
            (spec, RDF + "type", QB + "ComponentSpecification"),
            (spec, QB + role_prop, c["uri"]),
            (c["uri"], RDF + "type", QB + prop_class),
            (c["uri"], RDF + "type", OWL + owl_kind),
            (c["uri"], DCT + "identifier", c["name"]),
        }
        if c.get("label"):
            out.add((c["uri"], RDFS + "label", c["label"]))
        if c.get("description"):
            out.add((c["uri"], RDFS + "comment", c["description"]))
        if c["ctype"] == "compound":
            out.add((c["uri"], RDFS + "range", c["uri"] + "Class"))
        elif c["ctype"] == "date":
            out.add((c["uri"], RDFS + "range", XSD + "date"))
        elif c["ctype"] == "string_date":
            out.add((c["uri"], RDFS + "range", XSD + "dateTime"))
        elif c.get("datatype") in xsd_by_dt:
            out.add((c["uri"], RDFS + "range", xsd_by_dt[c["datatype"]]))

    miss = {c["name"]: 0 for c in comps}
    years: set[int] = set()
    n = len(entries)
    for e in entries:
        oid = str(e["id"])
        obs = f"{INST}observation-{dataset}-{oid}"
        out |= {
            (obs, RDF + "type", QB + "Observation"),
            (obs, QB + "dataSet", ds),
            (obs, RDFS + "label", f"{dataset} observation {oid}"),
            (obs, DCT + "source", f"{INST}source-{dataset}-{oid}"),
            (obs, DBO + "currency", currency_map[meta["currency"]]),
        }
        own_date = False
        for c in comps:
            v = e.get(c["name"])
            if c["ctype"] == "attribute":
                cv = _clean(v)
                if cv is None:
                    miss[c["name"]] += 1
                else:
                    out.add((obs, c["uri"], cv))
            elif c["ctype"] == "measure":
                cv = _clean(v)
                if cv is None:
                    miss[c["name"]] += 1
                else:
                    try:
                        out.add((obs, c["uri"], str(int(cv))))
                    except ValueError:
                        out.add((obs, c["uri"], cv))
            elif c["ctype"] == "compound":
                url = _clean((v or {}).get("html_url"))
                label = _clean((v or {}).get("label"))
                if url is None:
                    miss[c["name"]] += 1
                else:
                    out.add((obs, c["uri"], url))
                    if label is not None:
                        out.add((url, RDFS + "label", label))
                    out.add((url, RDF + "type", c["uri"] + "Class"))
            elif c["ctype"] == "date":
                y = (v or {}).get("year")
                if y is None:
                    miss[c["name"]] += 1
                else:
                    m = (v or {}).get("month") or 1
                    d = (v or {}).get("day") or 1
                    out.add((obs, c["uri"], f"{y:04d}-{m:02d}-{d:02d}"))
                    out.add((obs, ONT + "refYear", f"{y:04d}"))
                    years.add(y)
                    own_date = True
            elif c["ctype"] == "string_date":
                cv = _clean(v)
                parsed = _parse_string_date(cv) if cv is not None else None
                # raw-null counts as missing; parse failure is an error
                # counter, not a completeness miss (ConvertWorker.java:705-722)
                if cv is None:
                    miss[c["name"]] += 1
                if parsed is not None:
                    out.add((obs, c["uri"], parsed.strftime("%Y-%m-%dT%H:%M:%SZ")))
                    years.add(parsed.year)
                    own_date = True
        if default_year is not None and not own_date:
            out.add((obs, ONT + "refYear", f"{default_year:04d}"))

    if n:
        for c in comps:
            out.add((c["uri"], ONT + "completeness", _fmt6(1.0 - miss[c["name"]] / n)))
        expected = len(comps) * n
        total = sum(miss.values())
        out.add((ds, ONT + "completeness", _fmt6(1.0 - total / expected)))
        for y in sorted(years):
            out.add((ds, ONT + "refYear", f"{y:04d}"))
    return out
