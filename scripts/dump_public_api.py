#!/usr/bin/env python3
"""Dump the tier-1 public API surface — names AND signatures — as stable JSON.

Parity surface: reference ``scripts/dump_public_api.py`` pins the reviewed
tier-1 surface (module exports, callable signatures with annotations and
defaults, class members) into ``public_api_snapshot.json`` so CI fails on any
unreviewed drift. The reference walks the AST with griffe; griffe is not in
this image, so this implementation inspects the *imported* modules — which is
also the stronger contract on this codebase, because the ``ser`` alias package
and the lazy ``ser_tpu.utils`` facade only exist at import time.

Two snapshot files are maintained:

- ``public_api_snapshot.json`` — the flat ``ser_tpu.api.__all__`` name list
  (round-1 contract, kept byte-compatible).
- ``public_api_signatures.json`` — this script's output: per tier-1 module,
  per export, the kind, signature string, parameter details, dataclass /
  NamedTuple fields, and enum members.

Usage::

    python scripts/dump_public_api.py           # rewrite both snapshots
    python scripts/dump_public_api.py --check   # exit 1 on drift, write nothing
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import inspect
import json
import sys
from pathlib import Path
from typing import Any

SCHEMA_VERSION = 1
REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
ARCH_DIR = REPO_ROOT / "tests" / "suites" / "integration" / "architecture"
NAMES_SNAPSHOT = ARCH_DIR / "public_api_snapshot.json"
SIGNATURES_SNAPSHOT = ARCH_DIR / "public_api_signatures.json"

TIER_ONE_MODULES = (
    "ser_tpu",
    "ser_tpu.api",
    "ser_tpu.config",
    "ser_tpu.domain",
    "ser_tpu.profiles",
    "ser_tpu.utils",
)


def _annotation_text(value: Any) -> str | None:
    if value is inspect.Parameter.empty or value is inspect.Signature.empty:
        return None
    if isinstance(value, type):
        return value.__name__
    return str(value)


def _parameter_entry(param: inspect.Parameter) -> dict[str, Any]:
    return {
        "name": param.name,
        "kind": param.kind.name.lower(),
        "annotation": _annotation_text(param.annotation),
        "default": None if param.default is inspect.Parameter.empty else repr(param.default),
    }


def _callable_entry(obj: Any) -> dict[str, Any]:
    entry: dict[str, Any] = {"kind": "function"}
    try:
        sig = inspect.signature(obj)
    except (TypeError, ValueError):
        entry["signature"] = None
        return entry
    entry["signature"] = str(sig)
    entry["parameters"] = [_parameter_entry(p) for p in sig.parameters.values()]
    entry["returns"] = _annotation_text(sig.return_annotation)
    return entry


def _class_entry(cls: type) -> dict[str, Any]:
    entry: dict[str, Any] = {
        "kind": "class",
        "bases": sorted(b.__name__ for b in cls.__bases__ if b is not object),
    }
    if issubclass(cls, enum.Enum):
        entry["enum_members"] = {m.name: repr(m.value) for m in cls}
        return entry
    if dataclasses.is_dataclass(cls):
        entry["fields"] = {
            f.name: _annotation_text(f.type)
            for f in dataclasses.fields(cls)
        }
    elif hasattr(cls, "_fields"):  # NamedTuple
        entry["fields"] = {
            name: _annotation_text(cls.__annotations__.get(name))
            for name in cls._fields
        }
    try:
        entry["init"] = str(inspect.signature(cls))
    except (TypeError, ValueError):
        entry["init"] = None
    methods: dict[str, Any] = {}
    for name, member in sorted(vars(cls).items()):
        if name.startswith("_"):
            continue
        if callable(member) or isinstance(member, (classmethod, staticmethod, property)):
            if isinstance(member, property):
                methods[name] = {"kind": "property"}
                continue
            raw = member.__func__ if isinstance(member, (classmethod, staticmethod)) else member
            try:
                methods[name] = {
                    "kind": type(member).__name__ if not inspect.isfunction(member) else "method",
                    "signature": str(inspect.signature(raw)),
                }
            except (TypeError, ValueError):
                methods[name] = {"kind": "method", "signature": None}
    if methods:
        entry["methods"] = methods
    return entry


def _export_entry(obj: Any) -> dict[str, Any]:
    if inspect.isclass(obj):
        return _class_entry(obj)
    if callable(obj):
        return _callable_entry(obj)
    if inspect.ismodule(obj):
        return {"kind": "module"}
    return {"kind": "constant", "type": type(obj).__name__}


def _module_exports(module: Any) -> list[str]:
    declared = getattr(module, "__all__", None)
    if declared is not None:
        return sorted(declared)
    return sorted(
        name for name in vars(module) if not name.startswith("_")
    )


def build_signature_snapshot() -> dict[str, Any]:
    """The full tier-1 surface snapshot, deterministic and JSON-serializable."""
    import importlib

    modules: dict[str, Any] = {}
    for module_name in TIER_ONE_MODULES:
        module = importlib.import_module(module_name)
        exports: dict[str, Any] = {}
        for name in _module_exports(module):
            exports[name] = _export_entry(getattr(module, name))
        modules[module_name] = exports
    return {"schema_version": SCHEMA_VERSION, "modules": modules}


def build_name_snapshot() -> list[str]:
    """The flat api.__all__ list (byte-compatible with the round-1 snapshot)."""
    import importlib

    api = importlib.import_module("ser_tpu.api")
    return sorted(api.__all__)


def _dump(payload: Any) -> str:
    return json.dumps(payload, indent=2, sort_keys=True) + "\n"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--check",
        action="store_true",
        help="Compare against the committed snapshots; exit 1 on drift.",
    )
    args = parser.parse_args(argv)

    names = _dump(build_name_snapshot())
    signatures = _dump(build_signature_snapshot())

    if args.check:
        drift = []
        if NAMES_SNAPSHOT.read_text(encoding="utf-8") != names:
            drift.append(str(NAMES_SNAPSHOT))
        if (
            not SIGNATURES_SNAPSHOT.exists()
            or SIGNATURES_SNAPSHOT.read_text(encoding="utf-8") != signatures
        ):
            drift.append(str(SIGNATURES_SNAPSHOT))
        if drift:
            print(
                "Public API surface drifted from: " + ", ".join(drift) + "\n"
                "If intentional, regenerate with: python scripts/dump_public_api.py",
                file=sys.stderr,
            )
            return 1
        print("Public API snapshots are current.")
        return 0

    NAMES_SNAPSHOT.write_text(names, encoding="utf-8")
    SIGNATURES_SNAPSHOT.write_text(signatures, encoding="utf-8")
    print(f"Wrote {NAMES_SNAPSHOT} and {SIGNATURES_SNAPSHOT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
