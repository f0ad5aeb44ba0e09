#!/usr/bin/env python
"""A/B: host-f64 pooling vs SER_DEVICE_POOLING=1 on the accurate infer lane.

INFER_ACCURATE_r04.json showed the accurate serving path is fetch-bound:
~50 ms encode compute + 0.7-1.0 s pulling the (3000, 1280) f32 frame matrix
over the tunnel. With SER_DEVICE_POOLING=1, mean+std pooling runs on device
and only (n_windows, 2*dim) crosses the link. This harness measures the
end-to-end ``api.infer`` p50 both ways on the same clip + weights and writes
POOLING_AB_r{N}.json. Run on the real chip (no JAX_PLATFORMS=cpu).

Usage: python scripts/profile_device_pooling.py [--round 5] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, default=5)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from ser_tpu._internal.utils.jax_runtime import honor_platform_env

    honor_platform_env()

    import bench

    results: dict = {"lane": "infer_accurate_api_p50_60s_clip"}
    for label, flag in (("host_f64", "0"), ("device_pooling", "1")):
        os.environ["SER_DEVICE_POOLING"] = flag
        value, _, extras = bench._bench_infer_encoder("accurate")
        results[label] = {
            "audio_s_per_s": round(value, 2),
            **{k: v for k, v in extras.items() if "latency" in k or "dims" in k},
        }
        print(f"{label}: {results[label]}")
    os.environ.pop("SER_DEVICE_POOLING", None)

    host = results["host_f64"]["infer_accurate_p50_latency_s"]
    dev = results["device_pooling"]["infer_accurate_p50_latency_s"]
    results["p50_speedup"] = round(host / dev, 3) if dev else None
    print(f"p50 speedup (host/device): {results['p50_speedup']}x")

    out = args.out or str(REPO / f"POOLING_AB_r{args.round:02d}.json")
    Path(out).write_text(json.dumps(results, indent=2), encoding="utf-8")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
