"""Extension operator families for large-scale training-data pipelines:
text analysis, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force cosine, IVF, LSH), multimodal columns.

All hot paths are JVM-side Catalyst expressions (higher-order array
functions, regexp, md5/xxhash64) — no row-at-a-time Python. The only pandas
UDF surface is multimodal decode (the libraries are stubbed; the Spark-side
plumbing is real).
"""
