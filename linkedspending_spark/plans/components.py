"""Conversion-plan compiler: per-dataset mapping → ComponentProperty plan.

Analog of ``createComponents`` returning ``Set<ComponentProperty>``
(ConvertWorker.java:371-552, ComponentProperty.java:10-20). The plan is
a small driver-side object compiled once per dataset, then turned into
one ``select()`` of column expressions by the converter — the Spark
version of the reference's "the plan is the component set" design
(SURVEY.md §3.1).

Rules reproduced:

* ``amount`` force-retyped to measure
  (``CHANGE_AMOUNT_PROPERTY_TO_MEASURE``, ConvertWorker.java:52,395).
* string-typed field whose name contains ``date`` (and is not compound)
  → STRING_DATE (``USE_STRING_TO_DATE_NAME_HEURISTIC``,
  ConvertWorker.java:64,431-435).
* unknown mapping type → error (ConvertWorker.java:533-535).
* property URI: user override from the property mapping else
  ``{prefixOntology}{dataset}-{name}`` (ConvertWorker.java:397-402).
* validation: ≥1 attribute / ≥1 measure / ≥1 dimension — attribute
  count starts at 1 because currency is mandatory
  (ConvertWorker.java:375-378,546-550); unknown/missing currency code
  rejects the dataset (ConvertWorker.java:205-223).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .. import uris as U


class ComponentType(Enum):
    DATE = "date"  # struct {year, month, day} dimension
    COMPOUND = "compound"  # entity-reference dimension {html_url, label}
    MEASURE = "measure"  # numeric measure, int-parse with string fallback
    ATTRIBUTE = "attribute"  # plain string attribute
    STRING_DATE = "string_date"  # ISO-ish string retyped to dateTime


class UnknownMappingTypeError(ValueError):
    """Mapping declares a type outside {date, compound, measure, attribute}."""


class DatasetRejectedError(ValueError):
    """Dataset fails structural validation (component counts / currency)."""


_DIMENSION_TYPES = {ComponentType.DATE, ComponentType.COMPOUND}


@dataclass(frozen=True)
class ComponentProperty:
    dataset: str
    name: str
    ctype: ComponentType
    label: str | None = None
    description: str | None = None
    datatype: str | None = None  # declared: float|double|string|date|None
    uri: str = ""
    spec_uri: str = ""

    @property
    def range_class_uri(self) -> str:
        return U.range_class_uri_str(self.uri)

    @property
    def is_dimension(self) -> bool:
        return self.ctype in _DIMENSION_TYPES

    @property
    def is_dataset_specific(self) -> bool:
        # per-property completeness only for dataset-minted props
        # (ComponentProperty.java:19 isDataSetSpecific)
        return True


@dataclass
class DatasetMeta:
    dataset: str
    currency: str | None = None
    territories: list[str] = field(default_factory=list)
    default_time: str | None = None  # e.g. "2013-01-01 00:00:00"
    label: str | None = None
    description: str | None = None
    source_created: str | None = None
    source_modified: str | None = None

    @property
    def default_year(self) -> int | None:
        # first 4 chars of default_time (ConvertWorker.java:224-230)
        if self.default_time and len(self.default_time) >= 4:
            try:
                return int(self.default_time[:4])
            except ValueError:
                return None
        return None


@dataclass
class ComponentPlan:
    dataset: str
    components: list[ComponentProperty]
    meta: DatasetMeta

    def by_type(self, ctype: ComponentType) -> list[ComponentProperty]:
        return [c for c in self.components if c.ctype == ctype]


def _classify(name: str, mtype: str, datatype: str | None) -> ComponentType:
    if name == "amount":
        return ComponentType.MEASURE
    if mtype == "measure":
        return ComponentType.MEASURE
    if mtype == "compound":
        return ComponentType.COMPOUND
    if mtype == "date":
        return ComponentType.DATE
    if mtype == "attribute":
        if datatype == "string" and "date" in name:
            return ComponentType.STRING_DATE
        return ComponentType.ATTRIBUTE
    raise UnknownMappingTypeError(f"unknown mapping type {mtype!r} for field {name!r}")


def compile_plan(
    dataset: str,
    mapping_rows: list[dict],
    meta: DatasetMeta,
    known_currencies: set[str],
    property_mapping: dict[tuple[str, str], str] | None = None,
) -> ComponentPlan:
    """Compile + validate the per-dataset plan.

    ``mapping_rows``: dicts with keys name/type/label/description/datatype
    (one per field of the dataset's ``mapping`` JSON object,
    ConvertWorker.java:383-393).
    """
    property_mapping = property_mapping or {}
    comps: list[ComponentProperty] = []
    for row in mapping_rows:
        name = row["name"]
        ctype = _classify(name, row.get("type"), row.get("datatype"))
        uri = property_mapping.get((dataset, name)) or U.property_uri_str(dataset, name)
        comps.append(
            ComponentProperty(
                dataset=dataset,
                name=name,
                ctype=ctype,
                label=row.get("label"),
                description=row.get("description"),
                datatype=row.get("datatype"),
                uri=uri,
                spec_uri=U.spec_uri_str(uri),
            )
        )

    # currency gate (ConvertWorker.java:205-223)
    if not meta.currency:
        raise DatasetRejectedError(f"dataset {dataset}: no currency")
    if meta.currency not in known_currencies:
        raise DatasetRejectedError(
            f"dataset {dataset}: unknown currency code {meta.currency!r}"
        )

    # component-count gate (ConvertWorker.java:375-378,546-550):
    # attributeCount starts at 1 (mandatory currency attribute)
    n_attr = 1 + sum(
        1 for c in comps if c.ctype in (ComponentType.ATTRIBUTE, ComponentType.STRING_DATE)
    )
    n_measure = sum(1 for c in comps if c.ctype == ComponentType.MEASURE)
    n_dim = sum(1 for c in comps if c.is_dimension)
    if n_attr < 1 or n_measure < 1 or n_dim < 1:
        raise DatasetRejectedError(
            f"dataset {dataset}: needs >=1 attribute/measure/dimension, "
            f"got attr={n_attr} measure={n_measure} dim={n_dim}"
        )
    return ComponentPlan(dataset=dataset, components=comps, meta=meta)
