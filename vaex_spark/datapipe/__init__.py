"""Training-data pipeline operators (beyond-reference, SURVEY §7 step 11):
dedup (exact/MinHash-LSH/SimHash/Jaccard), similarity search (brute /
LSH / IVF), text analysis (lang-id, quality, tokens, fingerprints),
multimodal binary-column plumbing."""

from . import dedup, mixing, multimodal, repetition, similarity, sketches, text  # noqa: F401
