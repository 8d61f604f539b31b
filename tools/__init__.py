"""Dev harness scripts (oracle comparison, plan evidence, packaging).

Importable so tests reuse the exact comparison/normalization helpers the
dev harness runs (one implementation — pytest and the harness cannot
drift apart in float/NULL/timestamp normalization).
"""
