"""Structured Streaming bindings of the engine operators."""
