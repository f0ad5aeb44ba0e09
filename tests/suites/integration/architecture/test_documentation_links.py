"""Architecture contract: local documentation links resolve.

Parity surface: reference ``tests/suites/integration/architecture/
test_documentation_links.py`` — every relative Markdown link in the
repository's user-facing docs must point at a file that actually exists, so
refactors cannot silently orphan documentation.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[4]

_LINK = re.compile(r"\[[^\]]+\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_EXTERNAL = re.compile(r"^[a-z][a-z0-9+.-]*://", re.IGNORECASE)


def _documented_markdown_files() -> list[Path]:
    files = [
        REPO_ROOT / "README.md",
        REPO_ROOT / "CHANGELOG.md",
        REPO_ROOT / "COMPONENTS.md",
    ]
    files.extend(sorted((REPO_ROOT / "docs").rglob("*.md")))
    return [path for path in files if path.exists()]


def _local_targets(markdown: Path) -> list[str]:
    targets: list[str] = []
    for match in _LINK.finditer(markdown.read_text(encoding="utf-8")):
        target = match.group(1).split("#", 1)[0]
        if not target or _EXTERNAL.match(target) or target.startswith("mailto:"):
            continue
        targets.append(target)
    return targets


def test_local_markdown_links_resolve() -> None:
    """Relative links in README/CHANGELOG/COMPONENTS/docs must all resolve."""
    broken: list[str] = []
    for markdown in _documented_markdown_files():
        for target in _local_targets(markdown):
            if not (markdown.parent / target).resolve().exists():
                broken.append(f"{markdown.relative_to(REPO_ROOT)}: {target}")
    assert broken == [], f"Broken local documentation links: {broken}"


def test_required_top_level_docs_exist() -> None:
    """The documentation entry points the README promises must exist."""
    for name in ("README.md", "CHANGELOG.md", "SURVEY.md", "COMPONENTS.md"):
        assert (REPO_ROOT / name).is_file(), f"missing top-level doc {name}"
