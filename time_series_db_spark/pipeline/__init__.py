"""Large-scale training-data pipeline operators.

Beyond the reference's M3QL/PromQL surface, a 100 TB corpus engine needs
document-pipeline primitives: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine), approximate nearest-neighbor search,
text analysis (language ID, quality scoring, token counting,
fingerprinting), and multimodal column plumbing. All are pure DataFrame
compositions (JVM-side, codegen-friendly); the only Python is the
Arrow-batched ``mapInPandas`` decode stubs in :mod:`multimodal`.
"""

from time_series_db_spark.pipeline import ann, dedup, multimodal, text, textprep  # noqa: F401
