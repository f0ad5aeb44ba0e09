"""Dataset policy/license consent persistence and enforcement.

Parity surface: reference ``ser/_internal/data/application/consents.py`` /
``dataset_consents.py`` — consents are persisted as policy-id + license-id
sets and enforced at dataset preparation and training time.
"""

from __future__ import annotations

import json
from pathlib import Path

from ser_tpu._internal.config.schema import AppConfig, default_data_root
from ser_tpu._internal.data.catalog import get_dataset_spec
from ser_tpu.domain import DatasetConsents


class ConsentError(PermissionError):
    """Raised when a dataset is used without the required consents."""


def _store_path(settings: AppConfig | None = None) -> Path:
    return default_data_root() / "consents" / "dataset_consents.json"


def show_dataset_consents(*, settings: AppConfig | None = None) -> DatasetConsents:
    """Returns the persisted consent record."""
    path = _store_path(settings)
    if not path.exists():
        return DatasetConsents(policy_ids=(), license_ids=())
    try:
        data = json.loads(path.read_text(encoding="utf-8"))
        return DatasetConsents(
            policy_ids=tuple(sorted(map(str, data.get("policy_ids", [])))),
            license_ids=tuple(sorted(map(str, data.get("license_ids", [])))),
        )
    except (OSError, json.JSONDecodeError):
        return DatasetConsents(policy_ids=(), license_ids=())


def configure_dataset_consents(
    *,
    accept_policy_ids: tuple[str, ...] = (),
    accept_license_ids: tuple[str, ...] = (),
    settings: AppConfig | None = None,
    source: str = "ser_tpu.api.configure_dataset_consents",
) -> DatasetConsents:
    """Merges new consents into the persisted record and returns the result."""
    current = show_dataset_consents(settings=settings)
    merged = DatasetConsents(
        policy_ids=tuple(sorted(set(current.policy_ids) | set(accept_policy_ids))),
        license_ids=tuple(sorted(set(current.license_ids) | set(accept_license_ids))),
    )
    path = _store_path(settings)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        json.dumps(
            {
                "policy_ids": list(merged.policy_ids),
                "license_ids": list(merged.license_ids),
                "source": source,
            },
            indent=2,
        ),
        encoding="utf-8",
    )
    return merged


def ensure_dataset_consent(
    dataset_id: str, *, settings: AppConfig | None = None, accept_license: bool = False
) -> None:
    """Raises ``ConsentError`` unless the dataset's policy+license are consented."""
    spec = get_dataset_spec(dataset_id)
    if not spec.requires_consent:
        return
    if accept_license:
        configure_dataset_consents(
            accept_policy_ids=(spec.policy_id,),
            accept_license_ids=(spec.license_id,),
            settings=settings,
            source=f"prepare_dataset:{dataset_id}",
        )
        return
    consents = show_dataset_consents(settings=settings)
    if spec.policy_id not in consents.policy_ids or spec.license_id not in consents.license_ids:
        raise ConsentError(
            f"Dataset {dataset_id!r} requires consent to policy {spec.policy_id!r} and "
            f"license {spec.license_id!r}. Pass accept_license=True or run "
            "`ser data consents --accept ...`."
        )


__all__ = [
    "ConsentError",
    "configure_dataset_consents",
    "ensure_dataset_consent",
    "show_dataset_consents",
]
