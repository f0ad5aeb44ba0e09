"""Supported dataset catalog with license/policy identifiers.

Parity surface: reference ``ser/_internal/data/dataset_prepare.py:89-200`` +
``catalog/public_datasets.py`` — the same 16 dataset identifiers with their
policy/license ids and per-corpus label conventions.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DatasetSpec:
    """One supported dataset's identity and compliance metadata."""

    dataset_id: str
    display_name: str
    provider: str
    policy_id: str
    license_id: str
    languages: tuple[str, ...]
    requires_consent: bool = True


_SPECS: tuple[DatasetSpec, ...] = (
    DatasetSpec("ravdess", "RAVDESS", "zenodo", "ravdess-policy-v1", "CC-BY-NC-SA-4.0", ("en",)),
    DatasetSpec("crema-d", "CREMA-D", "github-lfs", "crema-d-policy-v1", "ODbL-1.0", ("en",)),
    DatasetSpec(
        "msp-podcast", "MSP-Podcast", "msp-mirror", "msp-podcast-policy-v1",
        "academic-license", ("en",),
    ),
    DatasetSpec(
        "biic-podcast", "BIIC-Podcast", "provider", "biic-podcast-policy-v1",
        "academic-license", ("zh",),
    ),
    DatasetSpec("emodb-2.0", "EmoDB 2.0", "provider", "emodb-policy-v1", "CC-BY-4.0", ("de",)),
    DatasetSpec(
        "escorpus-pe", "EsCorpus-PE", "provider", "escorpus-pe-policy-v1", "CC-BY-4.0", ("es",)
    ),
    DatasetSpec("mesd", "MESD", "mendeley", "mesd-policy-v1", "CC-BY-4.0", ("es",)),
    DatasetSpec(
        "oreau-french-esd", "Oreau French ESD", "provider", "oreau-policy-v1",
        "CC-BY-4.0", ("fr",),
    ),
    DatasetSpec("jl-corpus", "JL-Corpus", "provider", "jl-corpus-policy-v1", "CC0-1.0", ("en",)),
    DatasetSpec("cafe", "CaFE", "provider", "cafe-policy-v1", "CC-BY-NC-4.0", ("fr",)),
    DatasetSpec("asvp-esd", "ASVP-ESD", "provider", "asvp-esd-policy-v1", "CC-BY-4.0", ("mixed",)),
    DatasetSpec("emov-db", "EmoV-DB", "openslr", "emov-db-policy-v1", "CC-BY-4.0", ("en",)),
    DatasetSpec("pavoque", "PAVOQUE", "openslr", "pavoque-policy-v1", "CC-BY-NC-SA-4.0", ("de",)),
    DatasetSpec("att-hack", "Att-HACK", "provider", "att-hack-policy-v1", "CC-BY-NC-4.0", ("fr",)),
    DatasetSpec("coraa-ser", "CORAA-SER", "provider", "coraa-ser-policy-v1", "CC-BY-NC-4.0", ("pt",)),
    DatasetSpec(
        "spanish-meacorpus-2023", "Spanish MEACorpus 2023", "provider",
        "meacorpus-policy-v1", "CC-BY-NC-SA-4.0", ("es",),
    ),
)

DATASET_CATALOG: dict[str, DatasetSpec] = {spec.dataset_id: spec for spec in _SPECS}


def list_dataset_ids() -> tuple[str, ...]:
    """All supported dataset identifiers in deterministic order."""
    return tuple(sorted(DATASET_CATALOG))


def get_dataset_spec(dataset_id: str) -> DatasetSpec:
    """Returns one dataset spec or raises ``KeyError`` with guidance."""
    try:
        return DATASET_CATALOG[dataset_id]
    except KeyError as err:
        raise KeyError(
            f"Unknown dataset {dataset_id!r}. Supported: {', '.join(list_dataset_ids())}."
        ) from err


__all__ = ["DATASET_CATALOG", "DatasetSpec", "get_dataset_spec", "list_dataset_ids"]
