"""Backend-hook construction + restricted-license gate integration tests
(reference test_backend_hooks.py / test_license_gates.py pattern)."""

import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.runtime.backend_hooks import build_backend_hooks
from ser_tpu._internal.runtime import restricted_backends


def _settings(**env):
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def test_default_hooks_expose_only_fast():
    hooks = build_backend_hooks(_settings())
    assert set(hooks) == {"handcrafted"}


def test_enabled_profiles_add_hooks():
    hooks = build_backend_hooks(
        _settings(SER_ENABLE_MEDIUM_PROFILE="1", SER_ENABLE_ACCURATE_PROFILE="1")
    )
    assert set(hooks) == {"handcrafted", "jax_xlsr", "jax_whisper_encoder"}


def test_restricted_backend_needs_flag_and_consent(tmp_path, monkeypatch):
    # Point the consent store at a scratch location.
    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "consents.json"
    )
    # Profile enabled but restricted flag off → no emotion2vec hook.
    hooks = build_backend_hooks(_settings(SER_ENABLE_ACCURATE_RESEARCH_PROFILE="1"))
    assert "emotion2vec" not in hooks
    # Flag on but no consent → still gated.
    hooks = build_backend_hooks(
        _settings(
            SER_ENABLE_ACCURATE_RESEARCH_PROFILE="1",
            SER_ENABLE_RESTRICTED_BACKENDS="1",
        )
    )
    assert "emotion2vec" not in hooks
    # Recorded consent unlocks the hook.
    restricted_backends.record_backend_consent("emotion2vec")
    hooks = build_backend_hooks(
        _settings(
            SER_ENABLE_ACCURATE_RESEARCH_PROFILE="1",
            SER_ENABLE_RESTRICTED_BACKENDS="1",
        )
    )
    assert "emotion2vec" in hooks


def test_env_allowlist_grants_consent(monkeypatch, tmp_path):
    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "none.json"
    )
    settings = _settings(
        SER_ENABLE_ACCURATE_RESEARCH_PROFILE="1",
        SER_ENABLE_RESTRICTED_BACKENDS="1",
    )
    with pytest.raises(restricted_backends.RestrictedBackendError):
        restricted_backends.ensure_backend_access("emotion2vec", settings=settings)
    restricted_backends.ensure_backend_access(
        "emotion2vec", settings=settings, allowed_env=("emotion2vec",)
    )


def test_consent_invalidated_by_policy_change(tmp_path, monkeypatch):
    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "consents.json"
    )
    restricted_backends.record_backend_consent("emotion2vec")
    assert restricted_backends.has_backend_consent("emotion2vec")
    # Simulate a policy revision: fingerprint changes → consent stale.
    revised = restricted_backends.BackendPolicy(
        backend_id="emotion2vec",
        policy_id="emotion2vec-research-v2",
        license_id="model-specific-research-license",
        notice="revised",
    )
    monkeypatch.setitem(
        restricted_backends.RESTRICTED_BACKEND_POLICIES, "emotion2vec", revised
    )
    assert not restricted_backends.has_backend_consent("emotion2vec")


def test_distributed_init_noop_on_single_host(monkeypatch):
    from ser_tpu.parallel.distributed import initialize_distributed, is_multi_host_env

    monkeypatch.delenv("SER_DIST_COORDINATOR", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not is_multi_host_env()
    assert initialize_distributed() is False


def test_env_allowlist_grants_restricted_backend_access(tmp_path, monkeypatch):
    """SER_ALLOWED_RESTRICTED_BACKENDS grants access without the persisted
    consent store — previously parsed but never honored, making the error
    message's own advice nonfunctional."""
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.runtime import restricted_backends

    # Consent store isolated: no recorded consents.
    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "consents.json",
        raising=False,
    )
    denied = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_ENABLE_RESTRICTED_BACKENDS": "1"})
    )
    with pytest.raises(restricted_backends.RestrictedBackendError, match="consent"):
        restricted_backends.ensure_backend_access("emotion2vec", settings=denied)

    allowed = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_ENABLE_RESTRICTED_BACKENDS": "1",
                "SER_ALLOWED_RESTRICTED_BACKENDS": "emotion2vec",
            }
        )
    )
    restricted_backends.ensure_backend_access("emotion2vec", settings=allowed)


def test_persist_all_restricted_backend_consents(tmp_path, monkeypatch):
    """--accept-all-restricted-backends records every policy's fingerprint
    (reference restricted_backends.py:109-135)."""
    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "consents.json"
    )
    count = restricted_backends.persist_all_restricted_backend_consents()
    assert count == len(restricted_backends.RESTRICTED_BACKEND_POLICIES)
    for backend_id in restricted_backends.RESTRICTED_BACKEND_POLICIES:
        assert restricted_backends.has_backend_consent(backend_id)


def test_cli_accept_all_restricted_is_standalone_exit_zero(tmp_path, monkeypatch):
    """`ser --accept-all-restricted-backends` with no --train/--file persists
    consents and exits 0 (reference __main__.py:248-254 standalone semantics)."""
    import ser_tpu.__main__ as cli

    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "consents.json"
    )
    assert cli.main(["--accept-all-restricted-backends"]) == 0
    assert restricted_backends.has_backend_consent("emotion2vec")


def test_cli_accept_restricted_backends_profile_scoped(tmp_path, monkeypatch):
    """`ser --accept-restricted-backends --profile accurate-research` records
    consent for the profile's restricted backend only, then exits 0."""
    import ser_tpu.__main__ as cli

    store = tmp_path / "consents.json"
    monkeypatch.setattr(restricted_backends, "_consent_store_path", lambda: store)
    monkeypatch.setenv("SER_ENABLE_ACCURATE_RESEARCH_PROFILE", "1")
    assert cli.main(["--accept-restricted-backends", "--profile", "accurate-research"]) == 0
    assert restricted_backends.has_backend_consent("emotion2vec")

    # A profile whose backend is unrestricted records nothing.
    store.unlink()
    assert cli.main(["--accept-restricted-backends", "--profile", "fast"]) == 0
    assert not store.exists()


def test_build_provenance_metadata_shapes(tmp_path, monkeypatch):
    """License/access provenance payload (reference license_check.py:427-470):
    code revision, dependency fingerprint, access facts; restricted backends
    add license id + policy fingerprint."""
    monkeypatch.setattr(
        restricted_backends, "_consent_store_path", lambda: tmp_path / "consents.json"
    )
    monkeypatch.setenv("SER_CODE_REVISION", "r3-test")

    unrestricted = restricted_backends.build_provenance_metadata(
        settings=_settings(), backend_id="handcrafted", profile="fast"
    )
    assert unrestricted["code_revision"] == "r3-test"
    assert unrestricted["backend_is_restricted"] is False
    assert unrestricted["backend_access_source"] == "unrestricted"
    assert unrestricted["backend_access_allowed"] is True
    assert len(unrestricted["dependency_manifest_fingerprint"]) == 16

    denied = restricted_backends.build_provenance_metadata(
        settings=_settings(), backend_id="emotion2vec", profile="accurate-research"
    )
    assert denied["backend_is_restricted"] is True
    assert denied["backend_access_source"] == "denied"
    assert denied["backend_access_allowed"] is False
    assert "restricted_backend_policy_fingerprint" in denied

    restricted_backends.record_backend_consent("emotion2vec")
    granted = restricted_backends.build_provenance_metadata(
        settings=_settings(SER_ENABLE_RESTRICTED_BACKENDS="1"),
        backend_id="emotion2vec",
        profile="accurate-research",
    )
    assert granted["backend_access_source"] == "persisted_consent"
    assert granted["backend_access_allowed"] is True
    assert granted["backend_license_id"] == "model-specific-research-license"
