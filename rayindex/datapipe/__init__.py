"""Training-data pipeline operators beyond the reference's surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + IVF), text analysis
(lang-ID, quality, token counts, fingerprints), multimodal plumbing, and
windowed event aggregates — all Ray-Data-first batch transforms."""
