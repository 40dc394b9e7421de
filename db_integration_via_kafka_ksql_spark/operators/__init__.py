"""Batch operators. Each module maps to a SURVEY.md §2 block:

cdc.py        - §2.5 ST1-ST5 changelog materialization (the reference's core)
relational.py - §2.2-2.4 projection/filter/agg/join/window/sort/set-ops
dedup.py      - extension: exact + fuzzy dedup (MinHash LSH, SimHash, n-gram Jaccard)
similarity.py - extension: ANN over embedding columns
kmeans.py     - extension: distributed Lloyd's k-means + SemDeDup semantic dedup
text.py       - extension: language-ID, quality, tokens, fingerprints
multimodal.py - extension: opaque binary columns + Pandas-UDF plumbing
"""
