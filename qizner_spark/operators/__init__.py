"""DataFrame-level operators (detection, linking, eval, dedup, ...)."""
