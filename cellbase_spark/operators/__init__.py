"""Reusable operator library.

Operators Spark lacks natively, built as compositions of DataFrame ops
(SURVEY.md §4.3 — zero custom Catalyst rules needed):

    joins.py        as-of join, band/range join
    dedup.py        exact, minhash-LSH, simhash, token-Jaccard dedup
    similarity.py   cosine top-k, KNN join, IVF-bucketed ANN
    text.py         tokenization, language-ID, quality score, fingerprints
    multimodal.py   binary-column decode/feature plumbing (mapInPandas)
"""

from cellbase_spark.operators.joins import asof_join, band_join  # noqa: F401
