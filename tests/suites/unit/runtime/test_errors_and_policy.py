"""Per-owner unit coverage: error taxonomy, wire rehydration, retry policy."""

import pytest

from ser_tpu._internal.runtime.errors import (
    InferenceError,
    InferenceExecutionError,
    InferenceTimeoutError,
    ModelLoadError,
    ModelUnavailableError,
    RuntimeDependencyError,
    TransientInferenceError,
    error_kind,
    rehydrate_error,
)
from ser_tpu._internal.runtime.oom import DeviceOomInfo, is_device_oom, parse_device_oom
from ser_tpu._internal.runtime.policy import RetryPolicy, run_with_retry_policy


class TestErrorTaxonomy:
    @pytest.mark.parametrize(
        ("cls", "kind"),
        [
            (ModelUnavailableError, "model_unavailable"),
            (RuntimeDependencyError, "runtime_dependency"),
            (ModelLoadError, "model_load"),
            (InferenceTimeoutError, "timeout"),
            (TransientInferenceError, "transient"),
            (InferenceExecutionError, "execution"),
        ],
    )
    def test_kind_roundtrip(self, cls, kind):
        err = cls("boom", profile="accurate")
        assert error_kind(err) == kind
        back = rehydrate_error(kind, "boom", profile="accurate")
        assert type(back) is cls
        assert back.profile == "accurate"

    def test_subclass_maps_to_nearest_kind(self):
        class CustomTimeout(InferenceTimeoutError):
            pass

        assert error_kind(CustomTimeout("x")) == "timeout"

    def test_unknown_inputs_default_to_execution(self):
        assert error_kind(ValueError("nope")) == "execution"
        assert type(rehydrate_error("bogus_kind", "m")) is InferenceExecutionError

    def test_base_error_carries_profile(self):
        assert InferenceError("m", profile="fast").profile == "fast"


class TestRetryPolicy:
    def test_budgets_are_independent(self):
        calls = {"n": 0}

        def attempt():
            calls["n"] += 1
            if calls["n"] == 1:
                raise InferenceTimeoutError("t")
            if calls["n"] == 2:
                raise TransientInferenceError("x")
            return "ok"

        policy = RetryPolicy(max_timeout_retries=1, max_transient_retries=1)
        assert run_with_retry_policy(attempt, policy=policy, sleep=lambda _s: None) == "ok"
        assert calls["n"] == 3

    def test_timeout_budget_exhaustion_raises(self):
        def attempt():
            raise InferenceTimeoutError("slow")

        with pytest.raises(InferenceTimeoutError):
            run_with_retry_policy(
                attempt,
                policy=RetryPolicy(max_timeout_retries=2),
                sleep=lambda _s: None,
            )

    def test_transient_exhaustion_runs_fallback_once(self):
        attempts = {"n": 0}
        fallback = {"n": 0}

        def attempt():
            attempts["n"] += 1
            raise TransientInferenceError("flaky")

        def on_fallback():
            fallback["n"] += 1
            return "cpu-result"

        result = run_with_retry_policy(
            attempt,
            policy=RetryPolicy(max_transient_retries=2),
            on_exhausted_transient=on_fallback,
            sleep=lambda _s: None,
        )
        assert result == "cpu-result"
        assert attempts["n"] == 3 and fallback["n"] == 1

    def test_backoff_applied_between_attempts(self):
        sleeps: list[float] = []
        calls = {"n": 0}

        def attempt():
            calls["n"] += 1
            if calls["n"] < 3:
                raise TransientInferenceError("x")
            return "ok"

        run_with_retry_policy(
            attempt,
            policy=RetryPolicy(max_transient_retries=2, retry_backoff_seconds=0.25),
            sleep=sleeps.append,
        )
        assert sleeps == [0.25, 0.25]

    def test_non_inference_errors_propagate_immediately(self):
        def attempt():
            raise ValueError("not retryable")

        with pytest.raises(ValueError):
            run_with_retry_policy(
                attempt, policy=RetryPolicy(5, 5), sleep=lambda _s: None
            )


class TestOomParsing:
    def test_detection_positive_shapes(self):
        for message in (
            "RESOURCE_EXHAUSTED: Out of memory while trying to allocate 8589934592 bytes",
            "Allocation failure: exceeded hbm capacity",
            "backend OOM during dispatch",
            "failed to allocate request for 2.1 MB",
        ):
            assert is_device_oom(message), message

    def test_detection_rejects_lookalikes(self):
        assert not is_device_oom("could not open ROOM_101.wav")
        assert not is_device_oom("deterministic shape mismatch")

    def test_parse_canonical_xla_message(self):
        info = parse_device_oom(
            "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
            "8589934592 bytes. 2.5G free, limit: 16.0G"
        )
        assert info.requested_bytes == 8589934592
        assert info.available_bytes == int(2.5 * (1 << 30))
        assert info.limit_bytes == 16 * (1 << 30)
        assert info.is_informative

    def test_parse_uninformative_message(self):
        info = parse_device_oom("OOM")
        assert info == DeviceOomInfo()
        assert not info.is_informative


class TestHardOomShortcut:
    """Hard-OOM failover shortcut (reference
    stable_whisper_transcribe_runtime.py:20-45: FAILOVER_CPU_NOW by default,
    RETRY_NEXT_PRECISION when the shortcut is disabled)."""

    def test_hard_oom_skips_retry_ladder(self):
        attempts = {"n": 0}

        def attempt():
            attempts["n"] += 1
            raise TransientInferenceError("oom", profile="fast", hard_oom=True)

        fallback_ran = {"v": False}

        def fallback():
            fallback_ran["v"] = True
            return "cpu-result"

        result = run_with_retry_policy(
            attempt,
            policy=RetryPolicy(max_transient_retries=3, hard_oom_failover_now=True),
            on_exhausted_transient=fallback,
            sleep=lambda _s: None,
        )
        assert result == "cpu-result"
        assert attempts["n"] == 1  # no retries burned
        assert fallback_ran["v"]

    def test_shortcut_disabled_uses_normal_ladder(self):
        attempts = {"n": 0}

        def attempt():
            attempts["n"] += 1
            raise TransientInferenceError("oom", profile="fast", hard_oom=True)

        result = run_with_retry_policy(
            attempt,
            policy=RetryPolicy(max_transient_retries=2, hard_oom_failover_now=False),
            on_exhausted_transient=lambda: "cpu-after-ladder",
            sleep=lambda _s: None,
        )
        assert result == "cpu-after-ladder"
        assert attempts["n"] == 3  # initial + 2 retries

    def test_soft_transient_unaffected_by_shortcut(self):
        attempts = {"n": 0}

        def attempt():
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise TransientInferenceError("hiccup", profile="fast")
            return "ok"

        result = run_with_retry_policy(
            attempt,
            policy=RetryPolicy(max_transient_retries=3, hard_oom_failover_now=True),
            sleep=lambda _s: None,
        )
        assert result == "ok"
        assert attempts["n"] == 3

    def test_hard_oom_without_fallback_respects_budget(self):
        attempts = {"n": 0}

        def attempt():
            attempts["n"] += 1
            raise TransientInferenceError("oom", profile="fast", hard_oom=True)

        import pytest as _pytest

        with _pytest.raises(TransientInferenceError):
            run_with_retry_policy(
                attempt,
                policy=RetryPolicy(max_transient_retries=1, hard_oom_failover_now=True),
                sleep=lambda _s: None,
            )
        assert attempts["n"] == 2

    def test_env_knob_captured(self):
        from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
        from ser_tpu._internal.config.settings_inputs import capture_settings_inputs

        on = build_settings_from_inputs(capture_settings_inputs(env={}))
        assert on.transcription.hbm_hard_oom_shortcut_enabled is True
        off = build_settings_from_inputs(
            capture_settings_inputs(
                env={"SER_TRANSCRIPTION_MPS_HARD_OOM_SHORTCUT": "0"}
            )
        )
        assert off.transcription.hbm_hard_oom_shortcut_enabled is False
