"""Dataflow operators: converters, linking, canonicalization, dedup, ANN."""
