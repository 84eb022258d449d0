"""PySpark-native main-content extraction engine.

A from-scratch re-expression of the extraction semantics of
kamranxdev/trafilatura (Dart, at /root/reference) as a Spark batch
pipeline over interleaved text+media span documents.  See SURVEY.md.
"""

from .core import ExtractionResult, bare_extraction, extract, extract_txt, load_html
from .operators.deduplication import reset_caches
from .settings import Options

__all__ = ["Options", "ExtractionResult", "bare_extraction", "extract", "extract_txt", "load_html", "reset_caches"]
__version__ = "0.1.0"
