"""Column-level functions: validators, text extraction/analysis, hashing
primitives shared with external oracles, and vector math."""
