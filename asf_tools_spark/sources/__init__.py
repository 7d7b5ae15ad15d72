"""Sources & sinks: synthetic page tables, testdata readers, lineage."""
