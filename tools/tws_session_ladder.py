#!/usr/bin/env python
"""Same-boundary session ladder (r12 verdict ticket #7): time the
session-window workload through the state-v2 (TWS) and state-v1 (apws)
runtimes over IDENTICAL staged feeds at 1x (sf0.1) and a synthetic 10x,
so the v2 protocol's cost is isolated from data growth and batching.

Usage: python tools/tws_session_ladder.py [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kasper_spark.session import get_spark  # noqa: E402
from tools.scale10x import SF1, build_10x  # noqa: E402


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("tws-session-ladder")
    from kasper_spark.operators.streaming_twins import _session_tws_run
    from kasper_spark.streaming.state import sessionize_apws, sessionize_tws

    out = tempfile.mkdtemp(prefix="kasper-10x-")
    try:
        print("building 10x dataset in", out, flush=True)
        build_10x(spark, out)
        results = {}
        for label, sf in (("1x", SF1), ("10x", out)):
            for rt, fn in (("tws", sessionize_tws), ("apws", sessionize_apws)):
                w = timed(
                    lambda: _session_tws_run(spark, sf, n_files, sessionizer=fn)
                )
                results[(rt, label)] = w
                print(f"{rt} @ {label}: {w:.2f}s", flush=True)
        for rt in ("tws", "apws"):
            print(
                f"{rt} 10x ratio: {results[(rt, '10x')] / results[(rt, '1x')]:.2f}x",
                flush=True,
            )
        print(
            "v2-vs-v1 at 10x: "
            f"{results[('tws', '10x')] / results[('apws', '10x')]:.2f}x",
            flush=True,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
