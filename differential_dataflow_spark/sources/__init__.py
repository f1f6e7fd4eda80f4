"""Sources: deterministic synthetic transcripts, parquet table loaders, the
update-stream view, and streaming input feeds (the reference's InputSession /
new_collection surface, src/input.rs:49-301)."""
