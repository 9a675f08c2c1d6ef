"""Structured Streaming twins of the batch event-time queries.

See ``pipelines`` for the readStream sources, windowed/sessionized
aggregations with watermarks, streaming dedup, and the
applyInPandasWithState custom stateful operator.
"""

from . import pipelines  # noqa: F401
