#!/usr/bin/env python
"""Full-dataset quality gate: fast vs candidate profile rollout decision.

Parity surface: reference ``scripts/run_full_dataset_quality_gate.sh`` +
``ser/_internal/runtime/quality_gate_cli.py``. Delegates to the same
workflow owner as ``ser gate`` (evaluate → decide → persist versioned report
→ enforce).

Usage: python scripts/run_quality_gate.py --candidate medium [--output gate.json]
Env: SER_DATASET_FOLDER (labeled corpus), SER_ALLOW_RANDOM_INIT=1 for
weightless environments.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--candidate",
        choices=("medium", "accurate", "accurate-research"),
        default="medium",
    )
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--folds", type=int, default=4)
    parser.add_argument("--require-pass", action="store_true")
    args = parser.parse_args()

    from ser_tpu._internal.config.bootstrap import reload_settings
    from ser_tpu._internal.runtime.quality_gate_workflow import (
        run_quality_gate_workflow,
    )

    return run_quality_gate_workflow(
        settings=reload_settings(),
        candidate=args.candidate,
        folds=args.folds,
        output_path=args.output,
        require_pass=args.require_pass,
    )


if __name__ == "__main__":
    sys.exit(main())
