"""Per-owner tests for ``_internal/transcript/base.py`` (adapter contract).

Behavior spec: reference ``ser/_internal/transcript/backends/base.py:17-113``
— CompatibilityReport blocking semantics, BackendRuntimeRequest defaults,
and the runtime-checkable adapter protocol that the JAX Whisper backend and
test doubles both satisfy.
"""

from __future__ import annotations

from ser_tpu._internal.transcript.base import (
    BackendRuntimeRequest,
    CompatibilityIssue,
    CompatibilityReport,
    TranscriptionBackendAdapter,
)


class TestCompatibilityReport:
    def test_empty_report_is_clean(self):
        assert CompatibilityReport().blocking is False

    def test_non_blocking_issues_stay_clean(self):
        report = CompatibilityReport(
            issues=(
                CompatibilityIssue("noise", "deprecation warning"),
                CompatibilityIssue("operational", "slow disk"),
            )
        )
        assert report.blocking is False

    def test_one_blocking_issue_blocks(self):
        report = CompatibilityReport(
            issues=(
                CompatibilityIssue("noise", "ok"),
                CompatibilityIssue("functional", "assets missing", blocking=True),
            )
        )
        assert report.blocking is True

    def test_issue_tiers_carried(self):
        issue = CompatibilityIssue("functional", "x", blocking=True)
        assert (issue.kind, issue.blocking) == ("functional", True)


class TestRuntimeRequest:
    def test_reference_defaults(self):
        request = BackendRuntimeRequest(model_name="large-v3")
        assert request.use_demucs is False
        assert request.use_vad is True
        assert request.device == "auto"
        assert request.precision_candidates == ("bfloat16", "float32")
        assert request.memory_tier == "standard"


class _FakeAdapter:
    backend_id = "fake"

    def check_compatibility(self):
        return CompatibilityReport()

    def setup_required(self):
        return False

    def prepare_assets(self):
        pass

    def load_model(self, request):
        pass

    def transcribe(self, file_path, *, language):
        return []


class TestProtocol:
    def test_structural_conformance_is_runtime_checkable(self):
        assert isinstance(_FakeAdapter(), TranscriptionBackendAdapter)

    def test_jax_whisper_backend_satisfies_the_protocol(self):
        from ser_tpu._internal.transcript.jax_whisper_backend import (
            JaxWhisperTranscriber,
        )

        # Structural check against the class surface (no model load).
        for method in (
            "check_compatibility",
            "setup_required",
            "prepare_assets",
            "load_model",
            "transcribe",
        ):
            assert callable(getattr(JaxWhisperTranscriber, method, None)), method
