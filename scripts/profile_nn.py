#!/usr/bin/env python
"""NN-kernel variant shootout on the real chip (VERDICT r4 item 2).

Times every masked-NN kernel variant with the self-calibrating chain timer
(bench.py chain_time — (T2-T1)/k differencing, tunnel-load immune) at the
bench shape (B=32, N=M=4096) plus the matcher's small/large bucket shapes,
and prints each against the VPU issue-rate bound.

Run from the repo root on the TPU:  python scripts/profile_nn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icpflow_jax_cache")

from bench import chain_time, _chain_fold  # noqa: E402
from icpflow_tpu.ops.knn import _masked_nn_xla  # noqa: E402
from icpflow_tpu.ops.pallas.nn_kernel import (  # noqa: E402
    masked_nn_pallas, masked_nn_points_pallas)

VPU_OPS_PER_SEC = 4 * 8 * 128 * 0.94e9


def bound_ms(b, n, m, ops_per_elem):
    return b * n * m * ops_per_elem / VPU_OPS_PER_SEC * 1e3


def profile_shape(b, n, m, iters=32, tcs=(8, 16)):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32) * 10)
    bb = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32) * 10)
    msk = jnp.asarray(rng.random((b, m)) > 0.2)
    _, d_xla = _masked_nn_xla(a, bb, msk, tile=512)
    print(f"--- shape B={b} N={n} M={m} "
          f"(bound13={bound_ms(b, n, m, 13):.3f} ms, "
          f"bound9={bound_ms(b, n, m, 9):.3f} ms)")

    def report(name, step, dref, ops):
        t0 = time.time()
        ms = chain_time(step, a, lambda o: jnp.sum(o[0]), iters) * 1e3
        err = float(jnp.max(jnp.abs(dref - d_xla)))
        bnd = bound_ms(b, n, m, ops)
        print(f"  {name:18s} {ms:8.3f} ms  util_vs_bound{ops}="
              f"{bnd / ms:.3f}  max_err={err:.2e}  (wall {time.time()-t0:.0f}s)")
        return ms

    res = {}
    tnn = min(1024, n)
    tmm = min(1024, m)
    for variant in ("mxu", "vpu"):
        def step(x, v=variant):
            _, d = masked_nn_pallas(x, bb, msk, tn=tnn, tm=tmm, variant=v)
            return _chain_fold(x, d[:, :, None]), d
        _, dv = masked_nn_pallas(a, bb, msk, tn=tnn, tm=tmm, variant=variant)
        res[variant] = report(variant, step, dv, 13)
    for tc in tcs:
        def step(x, t=tc):
            _, d = masked_nn_pallas(x, bb, msk, tn=tnn, variant="vpu2", tc=t)
            return _chain_fold(x, d[:, :, None]), d
        _, dv = masked_nn_pallas(a, bb, msk, tn=tnn, variant="vpu2", tc=tc)
        res[f"vpu2_tc{tc}"] = report(f"vpu2 tc={tc}", step, dv, 9)
    # points variants (the ICP inner-loop form)
    for variant in ("mxu", "vpu", "vpu2"):
        def step(x, v=variant):
            p, d = masked_nn_points_pallas(x, bb, msk, tn=tnn, tm=tmm,
                                           variant=v)
            return _chain_fold(x, d[:, :, None]), d
        _, dv = masked_nn_points_pallas(a, bb, msk, tn=tnn, tm=tmm,
                                        variant=variant)
        res[f"pts_{variant}"] = report(f"pts {variant}", step, dv,
                                       11 if variant == "vpu2" else 13)
    return res


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})")
    for rep in range(3):                   # variance check on the bench shape
        profile_shape(32, 4096, 4096)
    profile_shape(256, 512, 512)           # small matcher bucket (exact)
    profile_shape(32, 1024, 4096)          # large bucket: corr-capped src
    profile_shape(96, 1024, 1024)          # mid scale
