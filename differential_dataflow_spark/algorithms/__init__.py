"""Library algorithms composed from the engine's operators — the reference's
src/algorithms/* ported semantically (SURVEY.md §2.8)."""
