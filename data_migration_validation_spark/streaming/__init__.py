"""Streaming: Structured Streaming front-end for the CDC apply engine."""
