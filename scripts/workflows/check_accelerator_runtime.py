"""Validate an accelerator runtime lane for CI workflow runners.

Counterpart of the reference's ``scripts/workflows/check_torch_runtime.py``
(``--runtime mps|cuda|xpu`` probes via torch backends): this framework's
compute path is JAX, so the lanes are ``tpu`` (any accelerator backend —
tpu or the remote axon plugin), and ``cpu`` (the forced-CPU test lane,
including the virtual multi-device mesh used by the sharding suites).
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--runtime", choices=("tpu", "cpu"), required=True)
    parser.add_argument(
        "--min-devices", type=int, default=1,
        help="Fail unless at least this many devices are visible.",
    )
    args = parser.parse_args()

    import jax

    if args.runtime == "cpu":
        # The axon plugin registers via sitecustomize in every process; the
        # CPU lane must force the platform in-process (env alone is not
        # honored once the plugin pins jax_platforms).
        from ser_tpu._internal.utils.jax_runtime import honor_platform_env

        jax.config.update("jax_platforms", "cpu")
        honor_platform_env()

    try:
        devices = jax.devices()
    except RuntimeError as err:
        print(f"{args.runtime} runtime unavailable: {err}", file=sys.stderr)
        return 1

    platforms = sorted({d.platform for d in devices})
    if args.runtime == "tpu" and all(p == "cpu" for p in platforms):
        print(
            f"tpu runtime requested but only CPU devices are visible: {devices}",
            file=sys.stderr,
        )
        return 1
    if args.runtime == "cpu" and any(p != "cpu" for p in platforms):
        print(f"cpu lane leaked accelerator devices: {devices}", file=sys.stderr)
        return 1
    if len(devices) < args.min_devices:
        print(
            f"{args.runtime} lane has {len(devices)} device(s); "
            f"need >= {args.min_devices}",
            file=sys.stderr,
        )
        return 1

    print(f"{args.runtime} runtime OK: {len(devices)} device(s), platforms={platforms}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
