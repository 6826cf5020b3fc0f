"""CDC core: Debezium-style envelope parsing (envelope.py) and
current-state materialization / merge semantics (apply.py).

This is the typed, tested re-expression of the reference's consumer
path: reference spark/scripts/consumer.py parses `$.payload.before/
after/op` with get_json_object (lines 53-55), lands append-only log
tables (lines 68-81), and defers upsert semantics to a TODO (line 76).
Here: from_json with explicit schemas, a window-dedup/merge apply, and
golden tests from the reference's own CRUD scenarios
(postgres/scripts/manual/001-003, README.md:90-128).
"""
