"""Extension operators beyond the reference surface: the data-pipeline
toolkit (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB operation — everything JVM-side / Arrow-batched, no
row-at-a-time Python."""
