"""Sinks: hierarchical-document upsert store (reference O12), KV point
store (O13), and the hash state table backing change detection (O10)."""
