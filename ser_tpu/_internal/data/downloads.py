"""Dataset acquisition: provider registry + local archive materialization.

Parity surface: reference per-provider download owners
(``ser/_internal/data/*_downloads.py``: zenodo, openslr, mendeley, msp mirror,
provider, jl_corpus) and its archive extraction module. This runtime is
zero-egress by policy: providers are a documented registry (stable source
URLs, archive layouts) and :func:`materialize_dataset` works from archives the
operator staged locally — network fetches raise a typed error pointing at the
staging path.
"""

from __future__ import annotations

import shutil
import tarfile
import zipfile
from dataclasses import dataclass
from pathlib import Path

from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)


class DatasetDownloadUnavailableError(RuntimeError):
    """Raised when acquiring a dataset would require network access."""


class ArchiveError(ValueError):
    """Raised for unsupported or unsafe archives."""


@dataclass(frozen=True)
class ProviderSpec:
    """One acquisition provider: where the data lives and how it unpacks."""

    provider_id: str
    description: str
    url_template: str
    archive_kinds: tuple[str, ...] = ("zip", "tar")


PROVIDERS: dict[str, ProviderSpec] = {
    "zenodo": ProviderSpec(
        "zenodo",
        "Zenodo record downloads (e.g. RAVDESS record 1188976)",
        "https://zenodo.org/record/{record_id}/files/{file_name}",
    ),
    "openslr": ProviderSpec(
        "openslr",
        "OpenSLR resource mirrors (EmoV-DB, PAVOQUE)",
        "https://www.openslr.org/resources/{resource_id}/{file_name}",
    ),
    "mendeley": ProviderSpec(
        "mendeley",
        "Mendeley Data datasets (MESD)",
        "https://data.mendeley.com/public-files/datasets/{dataset_id}/files/{file_id}",
    ),
    "github-lfs": ProviderSpec(
        "github-lfs",
        "Git-LFS hosted corpora (CREMA-D); clone + `git lfs pull`",
        "https://github.com/{repo}.git",
    ),
    "msp-mirror": ProviderSpec(
        "msp-mirror",
        "MSP-Podcast academic mirror (license-gated account required)",
        "https://ecs.utdallas.edu/research/researchlabs/msp-lab/{file_name}",
    ),
    "provider": ProviderSpec(
        "provider",
        "Direct provider pages requiring manual acceptance",
        "{url}",
    ),
}


def fetch_from_provider(provider_id: str, **_format_args) -> None:
    """Always raises in this runtime: downloads must be staged by the operator."""
    spec = PROVIDERS.get(provider_id)
    hint = f" ({spec.description}; {spec.url_template})" if spec else ""
    raise DatasetDownloadUnavailableError(
        f"Network downloads are disabled in this runtime. Fetch the archive from "
        f"provider {provider_id!r}{hint} on a connected machine and pass its local "
        "path to materialize_dataset()/`ser data prepare`."
    )


def _safe_members(names: list[str], destination: Path) -> None:
    """Rejects path-traversal members before extraction."""
    for name in names:
        target = (destination / name).resolve()
        if not str(target).startswith(str(destination.resolve())):
            raise ArchiveError(f"Archive member escapes destination: {name!r}")


def extract_archive(archive_path: str | Path, destination: str | Path) -> list[str]:
    """Extracts one staged zip/tar archive; returns extracted member names.

    Mirrors the reference's archive-extraction owner including traversal
    protection.
    """
    archive = Path(archive_path)
    destination = Path(destination)
    destination.mkdir(parents=True, exist_ok=True)
    if not archive.exists():
        raise FileNotFoundError(f"Archive not found: {archive}")

    if zipfile.is_zipfile(archive):
        with zipfile.ZipFile(archive) as handle:
            names = handle.namelist()
            _safe_members(names, destination)
            handle.extractall(destination)
            return names
    if tarfile.is_tarfile(archive):
        with tarfile.open(archive) as handle:
            names = handle.getnames()
            _safe_members(names, destination)
            handle.extractall(destination)
            return names
    raise ArchiveError(f"Unsupported archive format: {archive.name}")


def materialize_dataset(
    *,
    dataset_id: str,
    archive_path: Path | None,
    destination: Path,
) -> Path:
    """Materializes a dataset from a staged local archive (or verifies in-place).

    Returns the dataset root ready for ``prepare_dataset``.
    """
    if destination.exists() and any(destination.iterdir()):
        logger.info("Dataset %s already materialized at %s", dataset_id, destination)
        return destination
    if archive_path is None:
        from ser_tpu._internal.data.catalog import get_dataset_spec

        fetch_from_provider(get_dataset_spec(dataset_id).provider)
    members = extract_archive(archive_path, destination)
    logger.info("Extracted %d members for %s into %s", len(members), dataset_id, destination)
    return destination


__all__ = [
    "ArchiveError",
    "DatasetDownloadUnavailableError",
    "PROVIDERS",
    "extract_archive",
    "fetch_from_provider",
    "materialize_dataset",
]
