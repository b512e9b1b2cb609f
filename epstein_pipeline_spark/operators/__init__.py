"""DataFrame-level operators: dedup passes, candidate joins,
connected components, cluster building, verification."""
