"""Sources & sinks (reference: ``include/gunrock/io`` — SURVEY.md §2.2)."""
