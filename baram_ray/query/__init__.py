"""Query-time BM25: brute-force oracle, block-max WAND, actor pool."""
