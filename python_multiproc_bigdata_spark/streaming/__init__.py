"""Structured Streaming variants (SURVEY §7 M5) — populated as operators land."""
