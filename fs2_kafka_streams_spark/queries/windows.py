"""Time-window queries (SURVEY §2 Q33–Q37): batch-replayed streaming semantics."""

from __future__ import annotations
