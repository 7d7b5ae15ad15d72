"""Assembled query plans: the engine's entry-point pipelines."""
