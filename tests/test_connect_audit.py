"""Spark Connect compatibility audit.

The package's DataFrame plans are Connect-clean by construction
(declarative API only); the classic-only touches — SparkContext / RDD /
JVM handles — are enumerated here and each must be (a) behind a
try/except or documented gate with a Connect-side behavior, and (b) in
docs/USAGE.md's "Spark Connect compatibility" table. A new classic-only
call added anywhere else fails this test until it is gated and
documented.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                   "fs2_kafka_streams_spark")

#: every permitted (file, reason) classic-only touch. Keys are paths
#: relative to the package root; values describe the gate.
ALLOWED = {
    "operators/util.py": (
        "spread width probe: sparkContext.defaultParallelism + "
        "df.rdd.getNumPartitions(), try/except with an inputFiles()-based "
        "Connect fallback; materialize(): sparkContext.getCheckpointDir() "
        "probe, try/except defaulting to localCheckpoint under Connect"
    ),
    "session.py": (
        "get_spark(): sparkContext.setLogLevel, try/except no-op under "
        "Connect (log level is a cluster-side setting there)"
    ),
    "vendor/__init__.py": (
        "inject_worker_path(): sc.environment PYTHONPATH injection, "
        "raises NotImplementedError with remediation under Connect"
    ),
}

PATTERN = re.compile(r"sparkContext|\.rdd\b|_jvm\b|_jsc\b")


def _code_lines(path):
    """Source lines with comments and docstrings stripped (crudely but
    sufficiently: full-line comments and lines inside triple-quoted
    blocks)."""
    out = []
    in_doc = False
    with open(path) as fh:
        for i, line in enumerate(fh, 1):
            stripped = line.strip()
            n_triple = stripped.count('"""') + stripped.count("'''")
            if in_doc:
                if n_triple:
                    in_doc = False
                continue
            if n_triple == 1:
                in_doc = True
                continue
            if stripped.startswith("#"):
                continue
            out.append((i, _strip_trailing_comment(line)))
    return out


def _strip_trailing_comment(line: str) -> str:
    """Cut at the first '#' OUTSIDE a string literal — a naive split('#')
    would also cut at a '#' inside an f-string/url literal, letting any
    classic-only call AFTER such a literal escape the audit entirely."""
    quote = None
    for j, ch in enumerate(line):
        if quote:
            if ch == quote and (j == 0 or line[j - 1] != "\\"):
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "#":
            return line[:j]
    return line


def test_classic_only_touches_are_exactly_the_documented_set():
    hits: dict[str, list[int]] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            for lineno, code in _code_lines(path):
                if PATTERN.search(code):
                    hits.setdefault(rel, []).append(lineno)

    undocumented = {f: ls for f, ls in hits.items() if f not in ALLOWED}
    assert not undocumented, (
        "classic-only Spark API calls outside the documented allowlist "
        f"(gate them and add to ALLOWED + docs/USAGE.md): {undocumented}"
    )
    stale = set(ALLOWED) - set(hits)
    assert not stale, f"allowlist entries with no remaining hits: {stale}"


def test_usage_doc_documents_the_allowlist():
    doc = os.path.join(os.path.dirname(PKG), "docs", "USAGE.md")
    with open(doc) as fh:
        text = fh.read()
    assert "Spark Connect compatibility" in text
    for rel in ALLOWED:
        assert rel in text, f"{rel} missing from USAGE.md Connect section"
