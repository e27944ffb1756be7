"""Execute every ``python`` code block in docs/USAGE.md.

The usage doc promises its snippets are runnable against the fixtures;
this test makes that promise structural: blocks run IN ORDER in one
shared namespace (so later snippets may use earlier definitions) with
``spark`` and ``sf_dir`` predefined, exactly as the doc states.
"""

from __future__ import annotations

import os
import re

import pytest

DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "USAGE.md",
)

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks() -> list[str]:
    with open(DOC) as fh:
        return _BLOCK_RE.findall(fh.read())


def test_doc_has_snippets():
    assert len(_blocks()) >= 8


def test_usage_snippets_execute(spark):
    from tests.conftest import SF_SMOKE

    ns: dict = {"spark": spark, "sf_dir": SF_SMOKE}
    for i, src in enumerate(_blocks()):
        try:
            exec(compile(src, f"USAGE.md[block {i}]", "exec"), ns)
        except Exception as exc:  # pragma: no cover - failure reporting
            pytest.fail(f"USAGE.md block {i} failed: {exc}\n---\n{src}")
