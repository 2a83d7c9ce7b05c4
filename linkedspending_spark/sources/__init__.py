"""Sources & sinks: dictionary tables, N-Triples sink, manifest store."""
