"""Serving: HTTP server, continuous batching, multi-chip DP dispatch."""

from .dp import DataParallelBatcher
from .scheduler import ContinuousBatcher
from .server import TTSServer, serve

__all__ = ["ContinuousBatcher", "DataParallelBatcher", "TTSServer", "serve"]
