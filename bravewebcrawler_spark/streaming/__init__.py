"""Structured Streaming variants of the engine's micro-batch semantics."""
