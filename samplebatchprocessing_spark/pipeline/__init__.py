"""Reference-semantics pipeline (SURVEY §2B P8): manifest of files ->
per-file transform -> output prefix + extension, idempotent retry."""
