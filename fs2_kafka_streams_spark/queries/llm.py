"""LLM-data-pipeline queries (SURVEY §2 Q41–Q44 + extended dedup/similarity/text)."""

from __future__ import annotations
