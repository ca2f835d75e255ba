"""Structured Streaming: incremental micro-batch runner + windowed aggs."""
