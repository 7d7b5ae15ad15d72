"""Optional Structured Streaming layer (the reference is strictly batch —
SURVEY §2.9; this covers incremental page ingestion for completeness)."""
