"""Architecture contracts: tier-1 import cost + executable README examples.

Parity surface: reference ``tests/suites/integration/architecture/
test_public_import_cost.py`` and ``test_readme_examples.py`` — the public
facade must stay importable without dragging in the heavyweight stacks it
merely brokers, and every executable Python example in README.md must
actually run against the real public API (with only the inference owner seam
stubbed).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[4]

_FENCE = "```"
_PY_LANGS = frozenset({"python", "python3"})
_NOEXEC = "noexec"


def test_tier_one_public_imports_avoid_foreign_ml_stacks():
    """Tier-1 imports must not eagerly import torch/transformers/librosa/flax.

    jax/optax ARE this framework's platform and load with the facade; the
    banned list is the foreign stacks (torch, HF transformers) and the
    optional-deps this runtime reimplements (librosa, soundfile), plus flax
    model code which must stay behind the lazy profile loaders.
    """
    script = textwrap.dedent(
        """
        import sys

        import ser_tpu
        import ser_tpu.api
        import ser_tpu.config
        import ser_tpu.domain
        import ser_tpu.profiles
        import ser_tpu.utils

        for name in ser_tpu.api.__all__:
            getattr(ser_tpu.api, name)

        banned = [m for m in ("torch", "transformers", "librosa", "soundfile", "flax")
                  if m in sys.modules]
        if banned:
            raise SystemExit(f"tier-1 import pulled in banned modules: {banned}")
        """
    )
    completed = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert completed.returncode == 0, completed.stderr or completed.stdout


def test_alias_package_import_matches_facade():
    """`import ser` must expose the same __all__ as ser_tpu.api."""
    script = textwrap.dedent(
        """
        import ser.api
        import ser_tpu.api

        assert list(ser.api.__all__) == list(ser_tpu.api.__all__)
        assert ser.api.infer is ser_tpu.api.infer
        """
    )
    completed = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert completed.returncode == 0, completed.stderr or completed.stdout


def _readme_python_blocks(readme_path: Path) -> tuple[str, ...]:
    """Executable fenced Python examples; malformed fences are errors."""
    examples: list[str] = []
    open_fence: tuple[int, bool, list[str]] | None = None
    for line_number, line in enumerate(
        readme_path.read_text(encoding="utf-8").splitlines(), start=1
    ):
        stripped = line.strip()
        if open_fence is not None:
            opened_at, excluded, source_lines = open_fence
            if stripped == _FENCE:
                source = "\n".join(source_lines).strip()
                if not excluded:
                    assert source, f"README Python fence at line {opened_at} is empty."
                    examples.append(source)
                open_fence = None
            else:
                source_lines.append(line)
            continue
        if not stripped.startswith(_FENCE):
            continue
        info = stripped.removeprefix(_FENCE).strip()
        if not info:
            continue
        language, *directives = info.split()
        if language.lower() not in _PY_LANGS:
            continue
        assert directives in ([], [_NOEXEC]), (
            f"README Python fence at line {line_number} has unsupported directives "
            f"{directives}; mark illustrative blocks with `{_NOEXEC}`."
        )
        open_fence = (line_number, directives == [_NOEXEC], [])
    assert open_fence is None, (
        f"README Python fence opened at line {open_fence[0]} never closes."
    )
    return tuple(examples)


def _runner(example_source: str, index: int) -> str:
    """Isolated runner stubbing ONLY the inference owner seam."""
    return textwrap.dedent(
        f"""
        import ser.api
        import ser.domain
        import ser_tpu.api as _facade


        def _fake_infer(file_path, **options):
            if "clip" not in str(file_path):
                raise AssertionError("README example used an unexpected file path.")
            return ser.api.InferenceExecution(
                profile=options.get("profile") or "fast",
                output_schema_version="README-test",
                backend_id="README-test",
                emotions=[ser.domain.EmotionSegment("neutral", 0.0, 1.0)],
                transcript=[],
                timeline=[],
            )


        _original = _facade._runtime_api.infer
        try:
            _facade._runtime_api.infer = _fake_infer
            exec(
                compile({example_source!r}, "README.md python block {index}", "exec"),
                {{"__name__": "__readme_example__"}},
            )
        finally:
            _facade._runtime_api.infer = _original
        """
    )


def test_readme_python_examples_execute():
    examples = _readme_python_blocks(REPO_ROOT / "README.md")
    assert examples, "README.md should carry at least one executable Python example."
    for index, source in enumerate(examples, start=1):
        completed = subprocess.run(
            [sys.executable, "-c", _runner(source, index)],
            cwd=REPO_ROOT,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert completed.returncode == 0, (
            f"README example {index} failed:\n{completed.stderr or completed.stdout}"
        )


def test_fence_parser_rejects_unclosed_and_unknown_directives(tmp_path):
    bad = tmp_path / "README.md"
    bad.write_text("```python\nprint('x')\n", encoding="utf-8")
    try:
        _readme_python_blocks(bad)
    except AssertionError as err:
        assert "never closes" in str(err)
    else:
        raise AssertionError("unclosed fence accepted")

    weird = tmp_path / "README2.md"
    weird.write_text("```python magic\nprint('x')\n```\n", encoding="utf-8")
    try:
        _readme_python_blocks(weird)
    except AssertionError as err:
        assert "unsupported directives" in str(err)
    else:
        raise AssertionError("unknown directive accepted")


def test_fence_parser_honors_noexec(tmp_path):
    readme = tmp_path / "README.md"
    readme.write_text(
        "```python noexec\nthis is not runnable pseudocode\n```\n"
        "```python\nprint('ok')\n```\n",
        encoding="utf-8",
    )
    assert _readme_python_blocks(readme) == ("print('ok')",)
