"""Placeholder — populated incrementally this round."""

QUERIES: dict = {}
ORACLE: dict = {}
