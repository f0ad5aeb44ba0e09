"""Architecture contract: the public type vocabulary is self-sufficient.

Parity surface: reference ``tests/suites/integration/architecture/
test_public_api_type_vocabulary.py`` — every first-party class reachable
through a public annotation (function signatures, dataclass/NamedTuple
fields, transitively through exported classes) must itself be importable
from a public facade module. A user following the type hints must never be
forced into ``ser_tpu._internal``.
"""

from __future__ import annotations

import dataclasses
import inspect
import typing

import ser_tpu.api
import ser_tpu.config
import ser_tpu.diagnostics.domain
import ser_tpu.domain
import ser_tpu.profiles
import ser_tpu.runtime.contracts
import ser_tpu.runtime.schema

#: The facades whose exports jointly form the public type vocabulary.
_PUBLIC_FACADES = (
    ser_tpu.api,
    ser_tpu.config,
    ser_tpu.domain,
    ser_tpu.profiles,
    ser_tpu.diagnostics.domain,
    ser_tpu.runtime.contracts,
    ser_tpu.runtime.schema,
)


def _is_first_party(cls: type) -> bool:
    module = getattr(cls, "__module__", "") or ""
    return module.startswith("ser_tpu") or module == "ser" or module.startswith("ser.")


def _public_vocabulary() -> set[int]:
    vocabulary: set[int] = set()
    for facade in _PUBLIC_FACADES:
        names = getattr(facade, "__all__", None) or dir(facade)
        for name in names:
            value = getattr(facade, name, None)
            if inspect.isclass(value):
                vocabulary.add(id(value))
    return vocabulary


def _resolved_hints(obj: object, path: str) -> dict[str, object]:
    try:
        return dict(typing.get_type_hints(obj))
    except (NameError, TypeError) as error:  # pragma: no cover - contract failure
        raise AssertionError(f"Unresolvable public annotation at {path}: {error}") from error


def test_public_annotations_resolve_within_public_vocabulary() -> None:
    """First-party types reachable from ``ser_tpu.api`` must be public."""
    vocabulary = _public_vocabulary()
    missing: dict[tuple[str, str], set[str]] = {}
    visited: set[int] = set()
    queue: list[tuple[object, str]] = [
        (getattr(ser_tpu.api, name), name) for name in ser_tpu.api.__all__
    ]

    def record(cls: type, path: str) -> None:
        if id(cls) not in vocabulary:
            missing.setdefault((cls.__module__, cls.__qualname__), set()).add(path)
        if id(cls) not in visited:
            visited.add(id(cls))
            queue.append((cls, path))

    def walk_annotation(value: object, path: str) -> None:
        if value is None or value is type(None) or value is typing.Any:
            return
        origin = typing.get_origin(value)
        if origin is not None:
            for argument in typing.get_args(value):
                walk_annotation(argument, path)
            return
        if isinstance(value, (tuple, list, set, frozenset)):
            for item in value:
                walk_annotation(item, path)
            return
        if inspect.isclass(value) and _is_first_party(value):
            record(value, path)

    while queue:
        obj, path = queue.pop()
        if inspect.isclass(obj):
            for field, annotation in _resolved_hints(obj, path).items():
                walk_annotation(annotation, f"{path}.{field}")
            if dataclasses.is_dataclass(obj) or hasattr(obj, "_fields"):
                continue
            try:
                signature = inspect.signature(obj)
            except (ValueError, TypeError):
                continue
            for name, parameter in signature.parameters.items():
                if parameter.annotation is not inspect.Parameter.empty:
                    walk_annotation(parameter.annotation, f"{path}({name})")
        elif inspect.isfunction(obj):
            for name, annotation in _resolved_hints(obj, path).items():
                walk_annotation(annotation, f"{path}.{name}")

    rendered = {
        f"{module}.{qualname}": sorted(paths)[:3]
        for (module, qualname), paths in sorted(missing.items())
    }
    assert not rendered, (
        "First-party types reachable through public annotations but not "
        f"exported from any public facade: {rendered}"
    )
