"""Operator library: relational coverage (SURVEY.md §2) plus training-data
pipeline operators (dedup / text / similarity / multimodal / events)."""
