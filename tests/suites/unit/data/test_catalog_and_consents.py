"""Per-owner unit coverage: dataset catalog and consent persistence."""

import pytest

from ser_tpu._internal.data import consents
from ser_tpu._internal.data.catalog import (
    DATASET_CATALOG,
    get_dataset_spec,
    list_dataset_ids,
)


class TestCatalog:
    def test_sixteen_datasets_with_stable_ids(self):
        ids = list_dataset_ids()
        assert len(ids) == 16
        assert ids == tuple(sorted(ids))
        assert "ravdess" in ids and "msp-podcast" in ids

    def test_every_spec_carries_compliance_metadata(self):
        # Reference policy classes (dataset_prepare.py:89-218).
        allowed = {"open", "noncommercial", "share_alike", "academic_only", "research_only"}
        for spec in DATASET_CATALOG.values():
            assert spec.policy_id in allowed, spec.dataset_id
            assert spec.license_id
            assert spec.languages
            assert spec.provider in (
                "zenodo",
                "github-lfs",
                "msp-mirror",
                "provider",
                "mendeley",
                "openslr",
            )

    def test_unknown_id_raises_with_guidance(self):
        with pytest.raises(KeyError, match="Supported:"):
            get_dataset_spec("imaginary-corpus")


@pytest.fixture
def consent_root(tmp_path, monkeypatch):
    # The store lives under the platform data dir (XDG on linux).
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path))
    return tmp_path


class TestConsents:
    def test_empty_store_reads_as_no_consents(self, consent_root):
        record = consents.show_dataset_consents()
        assert record.policy_ids == () and record.license_ids == ()

    def test_configure_merges_and_sorts(self, consent_root):
        consents.configure_dataset_consents(
            accept_policy_ids=("b-policy",), accept_license_ids=("CC-BY-4.0",)
        )
        merged = consents.configure_dataset_consents(accept_policy_ids=("a-policy",))
        assert merged.policy_ids == ("a-policy", "b-policy")
        # Ids normalize to lowercase on write (reference dataset_consents.py:97-105).
        assert merged.license_ids == ("cc-by-4.0",)
        # Persisted: a fresh read sees the merge.
        assert consents.show_dataset_consents().policy_ids == ("a-policy", "b-policy")

    def test_ensure_raises_without_consent(self, consent_root):
        with pytest.raises(consents.ConsentError, match="noncommercial"):
            consents.ensure_dataset_consent("ravdess")

    def test_accept_license_records_and_passes(self, consent_root):
        consents.ensure_dataset_consent("ravdess", accept_license=True)
        record = consents.show_dataset_consents()
        assert "noncommercial" in record.policy_ids
        assert "cc-by-nc-sa-4.0" in record.license_ids
        consents.ensure_dataset_consent("ravdess")  # now passes

    def test_partial_consent_still_blocks(self, consent_root):
        consents.configure_dataset_consents(accept_policy_ids=("ravdess-policy-v1",))
        with pytest.raises(consents.ConsentError):
            consents.ensure_dataset_consent("ravdess")

    def test_corrupt_store_reads_as_empty(self, consent_root):
        consents.configure_dataset_consents(accept_policy_ids=("p",))
        consents._store_path().write_text("{not json", encoding="utf-8")
        assert consents.show_dataset_consents().policy_ids == ()
