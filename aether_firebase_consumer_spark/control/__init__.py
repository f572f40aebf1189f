"""Control plane: resource registry + job lifecycle (reference O15-O19)."""
