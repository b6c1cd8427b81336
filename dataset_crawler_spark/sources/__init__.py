"""Sources & sinks: seed lists, N-Triples dumps, the snapshot table store."""
