"""Sources: batch + streaming scan builders (reference O1/O2)."""
