"""Deterministic URI minting as pure column expressions.

Reference rules (all pure string concatenation — SURVEY.md §1.4):

* dataset:      ``{prefixInstance}{datasetName}``        (ConvertWorker.java:178)
* DSD:          ``{datasetUri}/model``                   (ConvertWorker.java:186)
* property:     ``{prefixOntology}{dataset}-{field}``    (ConvertWorker.java:397-402)
* spec:         ``{propertyUri}-spec``                   (ConvertWorker.java:403)
* range class:  ``{propertyUri}Class``                   (ConvertWorker.java:361-364)
* observation:  ``{prefixInstance}observation-{dataset}-{id}``
                                                         (ConvertWorker.java:609-611)
* view/slice:   ``{prefixInstance}{dataset}/views/{name}`` (ConvertWorker.java:852)

The reference's one blank node (``osObservation``, ConvertWorker.java:607)
is replaced by a deterministic skolem URI so re-runs are idempotent.

Each helper takes and returns ``pyspark.sql.Column`` so minting stays
inside whole-stage codegen; ``*_str`` twins operate on plain Python
strings for driver-side plan construction and golden fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .model import PREFIX_INSTANCE, PREFIX_ONTOLOGY


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- column-expression variants --------------------------------------------

def dataset_uri(name: Column | str) -> Column:
    return F.concat(F.lit(PREFIX_INSTANCE), _col(name))


def dsd_uri(name: Column | str) -> Column:
    return F.concat(dataset_uri(name), F.lit("/model"))


def property_uri(dataset: Column | str, field: Column | str) -> Column:
    return F.concat(F.lit(PREFIX_ONTOLOGY), _col(dataset), F.lit("-"), _col(field))


def spec_uri(prop_uri: Column | str) -> Column:
    return F.concat(_col(prop_uri), F.lit("-spec"))


def range_class_uri(prop_uri: Column | str) -> Column:
    return F.concat(_col(prop_uri), F.lit("Class"))


def observation_uri(dataset: Column | str, obs_id: Column | str) -> Column:
    return F.concat(
        F.lit(PREFIX_INSTANCE + "observation-"), _col(dataset), F.lit("-"), _col(obs_id)
    )


def view_uri(dataset: Column | str, view_name: Column | str) -> Column:
    return F.concat(
        F.lit(PREFIX_INSTANCE), _col(dataset), F.lit("/views/"), _col(view_name)
    )


def skolem_source_uri(dataset: Column | str, obs_id: Column | str) -> Column:
    """Deterministic replacement for the reference's anonymous source node."""
    return F.concat(
        F.lit(PREFIX_INSTANCE + "source-"), _col(dataset), F.lit("-"), _col(obs_id)
    )


# --- plain-string variants (driver-side plans, golden fixtures) ------------

def dataset_uri_str(name: str) -> str:
    return PREFIX_INSTANCE + name


def dsd_uri_str(name: str) -> str:
    return dataset_uri_str(name) + "/model"


def property_uri_str(dataset: str, field: str) -> str:
    return f"{PREFIX_ONTOLOGY}{dataset}-{field}"


def spec_uri_str(prop_uri: str) -> str:
    return prop_uri + "-spec"


def range_class_uri_str(prop_uri: str) -> str:
    return prop_uri + "Class"


def observation_uri_str(dataset: str, obs_id: str) -> str:
    return f"{PREFIX_INSTANCE}observation-{dataset}-{obs_id}"


def view_uri_str(dataset: str, view_name: str) -> str:
    return f"{PREFIX_INSTANCE}{dataset}/views/{view_name}"


def skolem_source_uri_str(dataset: str, obs_id: str) -> str:
    return f"{PREFIX_INSTANCE}source-{dataset}-{obs_id}"
