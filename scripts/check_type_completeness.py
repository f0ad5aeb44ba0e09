#!/usr/bin/env python3
"""Enforce the public-surface type-completeness ratchet.

Parity surface: reference ``scripts/check_type_completeness.py:1-129`` runs
``pyright --verifytypes ser`` and enforces a configured completeness ratio
from ``[tool.ser.type_completeness].threshold``. This environment has no
pyright (zero egress), so the same property is computed in-house by runtime
inspection of the installed public surface: every exported symbol of
``ser_tpu.api`` (plus the public facade modules) is walked, and each public
callable's parameters and return annotation count toward the ratio.

Usage: python scripts/check_type_completeness.py [--json]
Exit codes: 0 ratio >= threshold, 1 below threshold, 2 configuration defect.
"""

from __future__ import annotations

import argparse
import dataclasses
import inspect
import json
import sys
import tomllib
from math import isfinite
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
MINIMUM_THRESHOLD = 0.95

#: Public facade modules audited in addition to the api exports.
PUBLIC_MODULES = (
    "ser_tpu.api",
    "ser_tpu.config",
    "ser_tpu.profiles",
    "ser_tpu.domain",
    "ser_tpu.runtime.contracts",
    "ser_tpu.runtime.schema",
    "ser_tpu.diagnostics.domain",
)


def _load_threshold() -> float:
    pyproject = tomllib.loads((REPO_ROOT / "pyproject.toml").read_text("utf-8"))
    section = (
        pyproject.get("tool", {}).get("ser-tpu", {}).get("type_completeness", {})
    )
    threshold = section.get("threshold")
    if isinstance(threshold, bool) or not isinstance(threshold, (int, float)):
        raise TypeError(
            "[tool.ser-tpu.type_completeness].threshold must be a number."
        )
    value = float(threshold)
    if not isfinite(value) or not MINIMUM_THRESHOLD <= value <= 1.0:
        raise ValueError(
            "[tool.ser-tpu.type_completeness].threshold must be between "
            f"{MINIMUM_THRESHOLD:.2f} and 1.00."
        )
    return value


def _callable_findings(qualname: str, fn: object) -> list[tuple[str, bool]]:
    """(symbol, annotated?) per parameter and for the return annotation."""
    try:
        sig = inspect.signature(fn)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        return []
    findings: list[tuple[str, bool]] = []
    for name, param in sig.parameters.items():
        if name in ("self", "cls"):
            continue
        findings.append(
            (f"{qualname}({name})", param.annotation is not inspect.Parameter.empty)
        )
    findings.append(
        (f"{qualname} -> return", sig.return_annotation is not inspect.Signature.empty)
    )
    return findings


def _class_findings(qualname: str, cls: type) -> list[tuple[str, bool]]:
    findings: list[tuple[str, bool]] = []
    if dataclasses.is_dataclass(cls) or hasattr(cls, "_fields"):
        # Dataclass / NamedTuple: fields are the contract.
        annotations = getattr(cls, "__annotations__", {})
        names = (
            [f.name for f in dataclasses.fields(cls)]
            if dataclasses.is_dataclass(cls)
            else list(getattr(cls, "_fields", ()))
        )
        for field in names:
            findings.append((f"{qualname}.{field}", field in annotations))
    is_protocol = bool(getattr(cls, "_is_protocol", False))
    for name, member in vars(cls).items():
        if name.startswith("_") and name != "__init__":
            continue
        if name == "__init__" and is_protocol:
            # typing.Protocol injects a (*args, **kwargs) __init__ — a
            # structural contract has no constructor surface to annotate.
            continue
        if inspect.isfunction(member):
            findings.extend(_callable_findings(f"{qualname}.{name}", member))
        elif isinstance(member, property) and member.fget is not None:
            findings.extend(_callable_findings(f"{qualname}.{name}", member.fget))
    return findings


def collect_findings() -> list[tuple[str, bool]]:
    import importlib

    findings: list[tuple[str, bool]] = []
    seen: set[int] = set()
    for module_name in PUBLIC_MODULES:
        module = importlib.import_module(module_name)
        exported = getattr(module, "__all__", None)
        names = (
            list(exported)
            if exported is not None
            else [n for n in vars(module) if not n.startswith("_")]
        )
        for name in names:
            obj = getattr(module, name, None)
            if obj is None or id(obj) in seen:
                continue
            seen.add(id(obj))
            qualname = f"{module_name}.{name}"
            if inspect.isclass(obj):
                findings.extend(_class_findings(qualname, obj))
            elif callable(obj):
                findings.extend(_callable_findings(qualname, obj))
    return findings


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", action="store_true", help="emit a JSON report")
    args = parser.parse_args()

    try:
        threshold = _load_threshold()
    except (KeyError, TypeError, ValueError) as err:
        print(f"configuration defect: {err}", file=sys.stderr)
        return 2

    findings = collect_findings()
    if not findings:
        print("no public symbols found — surface import is broken", file=sys.stderr)
        return 2
    annotated = sum(1 for _, ok in findings if ok)
    ratio = annotated / len(findings)
    missing = sorted(symbol for symbol, ok in findings if not ok)

    if args.json:
        print(
            json.dumps(
                {
                    "checked": len(findings),
                    "annotated": annotated,
                    "ratio": round(ratio, 4),
                    "threshold": threshold,
                    "missing": missing,
                },
                indent=2,
            )
        )
    else:
        print(
            f"type completeness: {annotated}/{len(findings)} = {ratio:.4f} "
            f"(threshold {threshold:.2f})"
        )
        for symbol in missing[:40]:
            print(f"  missing: {symbol}")
        if len(missing) > 40:
            print(f"  ... and {len(missing) - 40} more")
    return 0 if ratio >= threshold else 1


if __name__ == "__main__":
    sys.exit(main())
