"""Per-owner tests for ``_internal/utils/logger.py``.

Behavior spec: reference ``ser/_internal/utils/logger.py`` — namespaced
loggers under one framework root, idempotent configuration with level
adjustment, and scoped dependency-warning suppression policies.
"""

from __future__ import annotations

import logging
import warnings

from ser_tpu._internal.utils.logger import (
    DEPENDENCY_WARNING_POLICIES,
    WarningPolicy,
    configure_logging,
    get_logger,
    suppressed_dependency_warnings,
)


class TestNamespacing:
    def test_loggers_nest_under_framework_root(self):
        logger = get_logger("my.module")
        assert logger.name.startswith("ser_tpu")

    def test_already_rooted_names_not_double_prefixed(self):
        logger = get_logger("ser_tpu._internal.data.loader")
        assert logger.name == "ser_tpu._internal.data.loader"


class TestConfiguration:
    def test_reconfigure_adjusts_level_without_duplicate_handlers(self):
        configure_logging("INFO")
        root = logging.getLogger("ser_tpu")
        handlers_before = list(root.handlers)
        configure_logging("DEBUG")
        assert root.level == logging.DEBUG
        assert root.handlers == handlers_before  # no duplicates
        configure_logging("INFO")

    def test_invalid_level_falls_back_to_info(self):
        configure_logging("NOT_A_LEVEL")
        assert logging.getLogger("ser_tpu").level == logging.INFO


class TestWarningPolicies:
    def test_policy_suppresses_matching_warning_in_scope_only(self):
        policy = (
            WarningPolicy(r"noisy dependency", UserWarning, r".*"),
        )
        with warnings.catch_warnings(record=True) as seen:
            warnings.simplefilter("always")
            with suppressed_dependency_warnings(policy):
                warnings.warn("noisy dependency grumble", UserWarning, stacklevel=2)
                warnings.warn("a real actionable problem", UserWarning, stacklevel=2)
        messages = [str(w.message) for w in seen]
        assert "noisy dependency grumble" not in messages
        assert "a real actionable problem" in messages

    def test_suppression_is_scoped_not_global(self):
        with suppressed_dependency_warnings(
            (WarningPolicy(r"scoped-only", UserWarning, r".*"),)
        ):
            pass
        with warnings.catch_warnings(record=True) as seen:
            warnings.simplefilter("always")
            warnings.warn("scoped-only leak check", UserWarning, stacklevel=2)
        assert any("scoped-only" in str(w.message) for w in seen)

    def test_default_policies_cover_known_noise(self):
        patterns = {p.message_regex for p in DEPENDENCY_WARNING_POLICIES}
        assert any("fork" in p for p in patterns)
        assert any("TPU" in p for p in patterns)
