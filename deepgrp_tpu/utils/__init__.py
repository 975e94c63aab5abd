"""Small self-contained utilities (no heavy deps)."""
