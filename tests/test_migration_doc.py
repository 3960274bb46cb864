"""MIGRATION.md is executable documentation: every fenced python block
must run as-is against the smoke fixtures (with `spark` and `sf` in
scope, as the doc states). This keeps the switching guide from drifting
away from the real API — the doc-rot failure mode of every migration
guide."""

from __future__ import annotations

import os
import re

import pytest

from tests.conftest import SMOKE_SF

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "MIGRATION.md")


def _blocks():
    with open(_DOC) as fh:
        text = fh.read()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    # Label each block with its preceding section heading for readable
    # test ids / failure messages.
    labeled = []
    pos = 0
    for b in blocks:
        pos = text.find(b, pos)
        head = re.findall(r"^## (.+)$", text[:pos], flags=re.M)
        labeled.append(((head[-1] if head else "intro").split(" (")[0], b))
        pos += len(b)
    return labeled


_LABELED = _blocks()


def test_doc_has_expected_coverage():
    names = [n for n, _ in _LABELED]
    assert len(names) >= 8, names


@pytest.mark.parametrize(("name", "code"), _LABELED, ids=[n for n, _ in _LABELED])
def test_migration_snippet_runs(spark, name, code):
    exec(compile(code, f"MIGRATION.md::{name}", "exec"), {"spark": spark, "sf": SMOKE_SF})
