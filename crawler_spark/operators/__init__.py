"""Relational/dataflow operators of the engine (SURVEY.md §2).

All operators are compositions of built-in DataFrame ops — anti/semi joins,
hash aggregations, window top-k — so Catalyst plans them (broadcast
selection, AQE skew splitting, pushdown). Custom code is data layout only:
host-hash partitioning, salting, Bloom pre-filters.
"""
