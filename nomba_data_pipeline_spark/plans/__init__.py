"""Medallion models, query registry, runner and data-quality checks."""
