"""Operators: validation library, diff/reconciliation, LWW dedup, skew
tools, near-duplicate detection, and similarity search."""
