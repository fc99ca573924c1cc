"""Checkpoint / manifest / resume machinery."""
