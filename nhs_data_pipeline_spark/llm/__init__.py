"""Large-scale training-data pipeline operators.

Beyond the reference's NHS surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search over embedding columns,
text analysis (language ID, quality scores, token counts, fingerprints),
and multimodal binary-column plumbing. All hot paths are native Catalyst
expressions; the only Python crossings are the (stubbed) media decoders,
which are Arrow-batched ``mapInPandas``.
"""
