from .collector import Hit, Index, IndexMapping, SearchResult
from .query import parse_query
from .reader import IndexReader, SearchOptions
