"""Stateful / UDF queries (SURVEY §2 Q38–Q40)."""

from __future__ import annotations
