"""bleve_ray: a Ray-Data-native inverted-index build + BM25 query engine
with the query/data-processing capabilities of blevesearch/bleve."""

__version__ = "0.1.0"
