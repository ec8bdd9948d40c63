"""Engine operators: the reference attendance pipeline (SURVEY.md §2.2-2.6)
plus the beyond-parity LLM-data-pipeline layer (§2.7)."""
