"""Placeholder — populated in this round."""

REGISTRY: dict = {}
