"""Sources & sinks (SURVEY.md §2.1 S1-S11, §7 Phase 4).

- :mod:`.statement` — BBVA statement extraction (S1/S7/S8 + F1-F5/P6)
  as Spark expressions over a text column; PDF decode import-gated.
- :mod:`.workbook` — two-sheet inventory workbook source (S2/S3/S4,
  P2 validation, §1.5 degradation) + sheet deep-clean into the
  pipeline's typed contract; openpyxl paths import-gated.
- :mod:`.files` — directory scan + archive/dead-letter routing
  (S5/S6); the streaming twin lives in streaming/file_ingest.
"""
