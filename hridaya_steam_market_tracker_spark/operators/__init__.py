"""Composable DataFrame -> DataFrame operators.

Beyond the reference's own surface (SURVEY.md §2), this package carries
the large-scale training-data-pipeline operators the 100 TB posture
requires (BASELINE.json north star): deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), embedding similarity search, text analysis,
and multimodal column plumbing. Everything is declarative or
Arrow-batched — no driver-side loops over data.
"""
