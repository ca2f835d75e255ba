"""Engine operators: load-mode writers, SCD2 merge, dedup, similarity."""
