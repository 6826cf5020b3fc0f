"""Large-scale training-data-pipeline operators (the north-star surface
beyond the reference's own operators, BASELINE.json):

- dedup.py       exact, fingerprint, n-gram Jaccard, MinHash+LSH, SimHash
- similarity.py  brute-force cosine top-k, hyperplane-LSH ANN
- text.py        token stats, quality scoring, language-ID, fingerprints
- multimodal.py  binary-column plumbing with stubbed decoders

Each operator is a pure DataFrame -> DataFrame function (composable,
testable); thin wrappers in queries/llm_ops.py register them with the
driver contract.
"""
