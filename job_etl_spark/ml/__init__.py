"""LLM-training-data operators: near-duplicate detection (MinHash-LSH,
SimHash), similarity search (brute-force + LSH-bucketed ANN), text
analysis, and multimodal binary plumbing — the BASELINE.json extensions
beyond reference parity, all built on engine-portable md5-derived hashing
(seed-stable across engines and runs)."""
