"""Inverted-index construction: posting codec, build pipeline, segments."""
