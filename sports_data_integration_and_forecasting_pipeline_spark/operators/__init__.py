"""DataFrame -> DataFrame operators (lazy; Catalyst-optimized)."""
