"""Driver-contract query catalog: Spark plans + DuckDB oracle SQL."""
