"""Vectorized scalar functions (pandas UDFs + pure-Python cores).

Every function here has a *pure-Python core* (unit-testable, byte-fidelity
pinned against the reference semantics) and a *vectorized wrapper* used from
DataFrame plans. Per the engine contract there is no row-at-a-time Python in
any hot path: wrappers are pandas UDFs (Arrow-batched) or pure Spark SQL
expressions.
"""
