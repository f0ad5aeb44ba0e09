"""Utterance manifest schema v2 with JSONL IO and the primary label ontology.

Parity surface: reference ``ser/_internal/data/manifest.py:156-181`` +
``label_ontology.py`` — utterances carry identity, label (primary ontology +
raw), optional VAD, speaker/session, language, split assignment, normalized-
PCM sha256, and compliance ids.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from hashlib import sha256
from pathlib import Path

import numpy as np

#: The 8-class primary emotion ontology (RAVDESS-complete superset).
PRIMARY_EMOTIONS: tuple[str, ...] = (
    "neutral",
    "calm",
    "happy",
    "sad",
    "angry",
    "fearful",
    "disgust",
    "surprised",
)

#: Corpus-native labels outside the primary ontology that manifests may
#: carry (reference keeps att-hack attitudes and CORAA-SER's binary scheme
#: as-is, ``dataset_capabilities.py`` label schemas); training recipes
#: filter to PRIMARY_EMOTIONS.
EXTENDED_LABELS: tuple[str, ...] = (
    "contempt",
    "friendly",
    "distant",
    "dominant",
    "seductive",
    "non_neutral_female",
    "non_neutral_male",
)

MANIFEST_SCHEMA_VERSION = 2


class ManifestError(ValueError):
    """Raised on malformed manifests or invalid utterance records."""


@dataclass(frozen=True)
class Utterance:
    """One labeled audio sample in a dataset manifest."""

    sample_id: str
    corpus: str
    audio_path: str
    label: str | None
    raw_label: str = ""
    valence: float | None = None
    arousal: float | None = None
    dominance: float | None = None
    social_attitude: str | None = None
    binary_affect: str | None = None
    transcript: str | None = None
    speaker_id: str | None = None
    session_id: str | None = None
    language: str = "en"
    split: str | None = None
    native_split: str | None = None
    audio_sha256: str | None = None
    revision: str | None = None
    license_id: str | None = None
    policy_id: str | None = None
    extra: dict = field(default_factory=dict)

    def validate(self) -> None:
        if not self.sample_id:
            raise ManifestError("Utterance sample_id must be non-empty.")
        if not self.corpus:
            raise ManifestError(f"Utterance {self.sample_id}: corpus must be non-empty.")
        if not self.audio_path:
            raise ManifestError(f"Utterance {self.sample_id}: audio_path must be non-empty.")
        if self.label is None:
            # Schema v2 allows label-free rows IF another training target
            # exists (reference ``manifest.py:206-215``: SSL/VAD/attitude/
            # binary-affect/language/transcript rows are valid without a
            # categorical label).
            if not any(
                (
                    self.valence is not None,
                    self.social_attitude,
                    self.binary_affect,
                    self.transcript,
                    self.language,
                )
            ):
                raise ManifestError(
                    f"Utterance {self.sample_id}: schema v2 requires at least "
                    "one training target (label/VAD/attitude/binary-affect/"
                    "language/transcript)."
                )
        elif self.label not in PRIMARY_EMOTIONS and self.label not in EXTENDED_LABELS:
            raise ManifestError(
                f"Utterance {self.sample_id}: label {self.label!r} is not in the "
                f"primary ontology {PRIMARY_EMOTIONS} nor the extended set "
                f"{EXTENDED_LABELS}."
            )
        if self.split is not None and self.split not in ("train", "dev", "test"):
            raise ManifestError(
                f"Utterance {self.sample_id}: split must be train/dev/test, got {self.split!r}."
            )


def normalized_pcm_sha256(audio: np.ndarray) -> str:
    """Content digest of the normalized float32 PCM (decode-invariant identity).

    Reference ``training_readiness.py:517-567``: digests are computed over the
    canonical normalized PCM so container/encoding changes don't shift sample
    identity.
    """
    canonical = np.ascontiguousarray(np.asarray(audio, dtype=np.float32))
    return sha256(canonical.tobytes()).hexdigest()


def write_manifest_jsonl(utterances: list[Utterance], path: str | Path) -> str:
    """Writes one manifest as JSONL with a schema-version header record."""
    target = Path(path)
    target.parent.mkdir(parents=True, exist_ok=True)
    with target.open("w", encoding="utf-8") as handle:
        handle.write(
            json.dumps({"manifest_schema_version": MANIFEST_SCHEMA_VERSION}) + "\n"
        )
        for utterance in utterances:
            utterance.validate()
            handle.write(json.dumps(asdict(utterance), default=str) + "\n")
    return str(target)


def read_manifest_jsonl(path: str | Path) -> list[Utterance]:
    """Reads + validates one JSONL manifest."""
    source = Path(path)
    if not source.exists():
        raise FileNotFoundError(f"Manifest not found: {path}")
    utterances: list[Utterance] = []
    with source.open("r", encoding="utf-8") as handle:
        first = handle.readline()
        if not first.strip():
            raise ManifestError(f"Manifest {path} is empty.")
        try:
            header = json.loads(first)
        except json.JSONDecodeError as err:
            raise ManifestError(f"Manifest {path} header is not valid JSON.") from err
        if not isinstance(header, dict):
            raise ManifestError(f"Manifest {path} header must be a JSON object.")
        version = header.get("manifest_schema_version")
        if version not in (1, MANIFEST_SCHEMA_VERSION):
            raise ManifestError(f"Unsupported manifest schema version {version!r} in {path}.")
        known = set(Utterance.__dataclass_fields__)
        for line_no, line in enumerate(handle, start=2):
            if not line.strip():
                continue
            try:
                record = json.loads(line)
            except json.JSONDecodeError as err:
                raise ManifestError(f"Manifest {path}:{line_no} is not valid JSON.") from err
            utterance = Utterance(
                **{k: v for k, v in record.items() if k in known}
            )
            utterance.validate()
            utterances.append(utterance)
    return utterances


__all__ = [
    "EXTENDED_LABELS",
    "MANIFEST_SCHEMA_VERSION",
    "ManifestError",
    "PRIMARY_EMOTIONS",
    "Utterance",
    "normalized_pcm_sha256",
    "read_manifest_jsonl",
    "write_manifest_jsonl",
]
