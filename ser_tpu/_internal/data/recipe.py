"""Versioned cross-corpus dataset recipes with strict audits.

Parity surface: reference ``ser/_internal/data/recipe.py`` +
``docs/dataset-recipes.md`` — a named recipe pins the corpus mix and label
policy for research training runs, and a strict audit catches duplicate
samples, speaker leakage across splits, and under-floor classes before any
training happens.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from ser_tpu._internal.data.manifest import PRIMARY_EMOTIONS, Utterance


@dataclass(frozen=True)
class DatasetRecipe:
    """One versioned cross-corpus training recipe."""

    recipe_id: str
    corpora: tuple[str, ...]
    target_labels: tuple[str, ...] = PRIMARY_EMOTIONS
    min_clips_per_class: int = 8
    require_speaker_ids: bool = True


#: Registered recipes (reference ships ``research-v1``).
RECIPES: dict[str, DatasetRecipe] = {
    "research-v1": DatasetRecipe(
        recipe_id="research-v1",
        corpora=(
            "ravdess",
            "crema-d",
            "emodb-2.0",
            "jl-corpus",
            "emov-db",
        ),
        min_clips_per_class=8,
    ),
}


@dataclass(frozen=True)
class RecipeAuditIssue:
    """One recipe audit finding."""

    kind: str
    message: str
    blocking: bool


@dataclass(frozen=True)
class RecipeAuditReport:
    """All audit findings for one utterance set against one recipe."""

    recipe_id: str
    issues: tuple[RecipeAuditIssue, ...] = field(default_factory=tuple)

    @property
    def blocking(self) -> bool:
        return any(issue.blocking for issue in self.issues)


def get_recipe(recipe_id: str) -> DatasetRecipe:
    try:
        return RECIPES[recipe_id]
    except KeyError as err:
        raise KeyError(
            f"Unknown recipe {recipe_id!r}. Registered: {', '.join(sorted(RECIPES))}."
        ) from err


def audit_recipe(
    utterances: list[Utterance],
    recipe: DatasetRecipe,
    *,
    strict: bool = False,
) -> RecipeAuditReport:
    """Audits one utterance set: dedupe, leakage, class floors, corpus scope.

    ``strict`` escalates warnings (missing digests/speakers) to blocking.
    """
    issues: list[RecipeAuditIssue] = []

    unknown_corpora = sorted({u.corpus for u in utterances} - set(recipe.corpora))
    if unknown_corpora:
        issues.append(
            RecipeAuditIssue(
                "corpus_scope",
                f"Corpora outside the recipe: {', '.join(unknown_corpora)}.",
                blocking=True,
            )
        )

    # Label policy: the recipe pins the target ontology; out-of-ontology
    # labels (extended CSV labels, scheme drift) must not silently add
    # classifier classes.
    stray_labels = sorted({u.label for u in utterances} - set(recipe.target_labels))
    if stray_labels:
        issues.append(
            RecipeAuditIssue(
                "label_scope",
                f"Labels outside the recipe ontology: {', '.join(stray_labels)}.",
                blocking=True,
            )
        )

    digests = [u.audio_sha256 for u in utterances if u.audio_sha256]
    duplicate_digests = [d for d, count in Counter(digests).items() if count > 1]
    if duplicate_digests:
        issues.append(
            RecipeAuditIssue(
                "duplicate_samples",
                f"{len(duplicate_digests)} duplicated audio digests across the set.",
                blocking=True,
            )
        )
    if len(digests) < len(utterances):
        issues.append(
            RecipeAuditIssue(
                "missing_digests",
                f"{len(utterances) - len(digests)} utterances lack audio_sha256 "
                "(dedupe incomplete).",
                blocking=strict,
            )
        )

    # Speaker leakage: one speaker assigned to more than one split.
    speaker_splits: dict[tuple[str, str], set[str]] = {}
    for u in utterances:
        if u.speaker_id and u.split:
            speaker_splits.setdefault((u.corpus, u.speaker_id), set()).add(u.split)
    leaking = [key for key, splits in speaker_splits.items() if len(splits) > 1]
    if leaking:
        issues.append(
            RecipeAuditIssue(
                "speaker_leakage",
                f"{len(leaking)} speakers appear in multiple splits "
                f"(e.g. {leaking[0][0]}/{leaking[0][1]}).",
                blocking=True,
            )
        )
    if recipe.require_speaker_ids:
        missing_speakers = sum(1 for u in utterances if not u.speaker_id)
        if missing_speakers:
            issues.append(
                RecipeAuditIssue(
                    "missing_speaker_ids",
                    f"{missing_speakers} utterances lack speaker ids.",
                    blocking=strict,
                )
            )

    counts = Counter(u.label for u in utterances)
    for label in recipe.target_labels:
        if counts.get(label, 0) < recipe.min_clips_per_class:
            issues.append(
                RecipeAuditIssue(
                    "class_floor",
                    f"Class {label!r} has {counts.get(label, 0)} clips "
                    f"(< {recipe.min_clips_per_class}).",
                    blocking=strict,
                )
            )

    return RecipeAuditReport(recipe_id=recipe.recipe_id, issues=tuple(issues))


__all__ = [
    "DatasetRecipe",
    "RECIPES",
    "RecipeAuditIssue",
    "RecipeAuditReport",
    "audit_recipe",
    "get_recipe",
]
