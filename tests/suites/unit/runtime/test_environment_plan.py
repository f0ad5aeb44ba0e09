"""Per-owner unit coverage: runtime environment plans."""

import os

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.runtime.environment_plan import (
    RuntimeEnvironmentPlan,
    build_runtime_environment_plan,
    temporary_process_env,
)


class TestBuildPlan:
    def test_plan_pins_hf_cache_and_offline(self):
        settings = reload_settings()
        plan = build_runtime_environment_plan(settings)
        assert plan.set_vars["HF_HUB_OFFLINE"] == "1"
        assert plan.set_vars["HF_HOME"] == str(settings.models.huggingface_cache_root)

    def test_plan_pins_modelscope_cache_for_research_lane(self):
        """Reference environment_plan.py:89-90: MODELSCOPE_CACHE rides the plan;
        the root is <model_cache_dir>/modelscope/hub (schema.py:338-341)."""
        settings = reload_settings()
        plan = build_runtime_environment_plan(settings)
        root = settings.models.modelscope_cache_root
        assert plan.set_vars["MODELSCOPE_CACHE"] == str(root)
        assert root == settings.models.model_cache_dir / "modelscope" / "hub"


class TestTemporaryProcessEnv:
    def test_sets_and_restores_preexisting_value(self, monkeypatch):
        monkeypatch.setenv("SER_EP_TEST", "original")
        plan = RuntimeEnvironmentPlan(set_vars={"SER_EP_TEST": "scoped"})
        with temporary_process_env(plan):
            assert os.environ["SER_EP_TEST"] == "scoped"
        assert os.environ["SER_EP_TEST"] == "original"

    def test_sets_and_removes_previously_absent_key(self, monkeypatch):
        monkeypatch.delenv("SER_EP_NEW", raising=False)
        with temporary_process_env(RuntimeEnvironmentPlan(set_vars={"SER_EP_NEW": "x"})):
            assert os.environ["SER_EP_NEW"] == "x"
        assert "SER_EP_NEW" not in os.environ

    def test_unset_restores_value(self, monkeypatch):
        monkeypatch.setenv("SER_EP_UNSET", "keepme")
        with temporary_process_env(RuntimeEnvironmentPlan(unset_vars=("SER_EP_UNSET",))):
            assert "SER_EP_UNSET" not in os.environ
        assert os.environ["SER_EP_UNSET"] == "keepme"

    def test_key_in_both_set_and_unset_does_not_leak(self, monkeypatch):
        """First-sight save rule: the plan's own value must never be 'restored'."""
        monkeypatch.setenv("SER_EP_BOTH", "original")
        plan = RuntimeEnvironmentPlan(
            set_vars={"SER_EP_BOTH": "scoped"}, unset_vars=("SER_EP_BOTH",)
        )
        with temporary_process_env(plan):
            assert "SER_EP_BOTH" not in os.environ
        assert os.environ["SER_EP_BOTH"] == "original"

    def test_restores_on_exception(self, monkeypatch):
        monkeypatch.setenv("SER_EP_ERR", "original")
        try:
            with temporary_process_env(RuntimeEnvironmentPlan(set_vars={"SER_EP_ERR": "x"})):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert os.environ["SER_EP_ERR"] == "original"
