"""Stateless map_batches stages (normalize/sha256/tokenize, text analytics)."""
