"""Training-data pipeline functions: dedup (exact/minhash/simhash/jaccard/
embedding), text analysis (tokens/quality/langid/fingerprint), similarity
search (brute-force + LSH ANN), and multimodal column plumbing.

The reference engine has no scalar-function library (SURVEY.md §2.9 — all
scalar logic is user closures); these modules are the closure library a
100 TB training-data pipeline needs, expressed as native pyspark.sql
expressions (JVM/codegen) with Arrow-vectorized kernels only where Spark has
no built-in."""
