"""Execute every python block in docs/quickstarts/*.md (reference parity:
tutorials are pytest-collectable, reference pyproject.toml:57). Docs that
don't run are docs that rot."""

import re
from pathlib import Path

import pytest

DOCS = sorted((Path(__file__).parent.parent / "docs" / "quickstarts").glob("*.md"))


@pytest.mark.parametrize("doc", DOCS, ids=[d.stem for d in DOCS])
def test_quickstart_runs(doc):
    blocks = re.findall(r"```python\n(.*?)```", doc.read_text(), flags=re.S)
    assert blocks, f"{doc} has no python blocks"
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{doc.name}[block {i}]", "exec"), ns)  # noqa: S102
        except Exception as e:
            raise AssertionError(f"{doc.name} block {i} failed: {e}") from e
