"""linkedspending_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of KonradHoeffner/linkedspending.

The reference (/root/reference) converts OpenSpending tabular-JSON datasets
into RDF Data Cube (QB) N-Triples and bulk-loads a triple store
(ConvertWorker.java:48).  This engine replays that role Spark-first:

* columnar DataFrames end-to-end (the reference is row-at-a-time Java,
  ResultsReader.java:39-47 — we invert that),
* triple emission as ``select`` + ``explode`` of struct arrays,
* dictionary entity linking as broadcast hash joins,
* canonicalization via iterative connected components,
* partitioned, manifest-checkpointed materialization (resume = anti-join),
* all per-row text logic in native column expressions or Arrow-batched
  pandas UDFs — never row-at-a-time Python.

Subpackages
-----------
``model``      triple schema + RDF/QB vocabulary (DataModel.java analog)
``uris``       deterministic URI minting column expressions
``functions``  scalar column functions (cleaning, dates, NT escaping, ngrams)
``plans``      conversion-plan compiler (ComponentProperty analog)
``operators``  converters, linking, canonicalization, dedup, ANN, text ops
``sources``    readers/sinks (parquet, TSV dictionaries, N-Triples, manifests)
``transcripts``the conversation-transcripts input surface (BASELINE input_hint)
"""

__version__ = "0.1.0"
