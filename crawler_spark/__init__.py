"""crawler_spark — a from-scratch PySpark-native URL-frontier + fetch scheduler.

A Spark-first reimplementation of the capabilities of ``nlweb-ai/crawler``
(reference at ``/root/reference``, read-only): a partitioned URL-seen set
(Bloom-prefiltered exact anti-join), a per-host politeness scheduler with
robots.txt caching, and a priority frontier (host-hash partitioned,
depth/score ordered) driven by iterative DataFrame jobs with vectorized
pandas/Arrow UDFs for URL canonicalization, JSON-LD extraction and text
extraction.

Design notes
------------
* Everything is declared through the DataFrame API so Catalyst handles
  predicate pushdown, column pruning, join selection and AQE; custom code is
  limited to data layout (host-hash partitioning, salting) and the driver
  epoch loop.
* The reference's queue + visibility-timeout machinery is replaced by an
  *epoch* state machine over a snapshot-versioned frontier table: an epoch
  either commits atomically or is re-run (see ``crawler_spark.crawl``).
* Byte-fidelity invariants (URL normalization, JSON-LD ``@id`` extraction,
  ``extract_essential_fields`` text) live in ``crawler_spark.functions`` as
  pure functions wrapped in pandas UDFs, pinned by golden tests.
"""

__version__ = "0.1.0"
