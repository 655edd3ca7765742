"""Structured Streaming slice: stateless clean-and-append + windowed aggs."""
