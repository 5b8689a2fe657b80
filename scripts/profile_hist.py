#!/usr/bin/env python
"""Decompose the histogram-init cost at the matcher bucket shapes.

kern_hist_small (B=256 pairs x 512 pts) measured 44.6 ms in BENCH_r04/r05 —
the single largest matcher kernel. This splits it into: voxel scatter, FFT
correlation, NMS + top-k peak pick, hypothesis scoring sweeps, and the yaw
sweep, each chain-timed on-chip. (Program-splitting caveat: XLA fuses the
full program differently, so treat splits as attribution hints — the
full-call time is printed alongside.)

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hist.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icpflow_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_cfg, chain_time, _chain_fold
from icpflow_tpu.ops import hist as _hist


def main():
    cfg = make_cfg()
    shapes = {"small": (cfg.pairs_small, cfg.max_points_small),
              "large": (cfg.pairs_large, cfg.max_points)}
    rng = np.random.default_rng(0)
    tf_dev = jnp.float32(2.0)
    for name, (b, n) in shapes.items():
        a = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        bb = a + 0.3
        msk = jnp.ones((b, n), bool)
        lxy, lz = cfg.hist_grid_xy, cfg.hist_grid_z
        print(f"--- hist_{name}: B={b} N={n} grid={lz}x{lxy}x{lxy} "
              f"yaws={len(cfg.hist_yaws)}")

        def full(x, bb=bb, msk=msk):
            T = _hist.estimate_init_translation(
                x, msk, bb, msk, tf_dev, bin_w=cfg.hist_bin,
                lxy=cfg.hist_grid_xy, lz=cfg.hist_grid_z,
                topk=cfg.hist_topk, nms_kernel=cfg.hist_nms_kernel,
                eval_tile=cfg.nn_tile, yaws=cfg.hist_yaws,
                coarse_cap=cfg.hist_coarse_cap, refine=cfg.hist_refine,
                yaw_per_m=cfg.hist_yaw_per_m,
                yaw_scale_cap=cfg.hist_yaw_scale_cap)
            return _chain_fold(x, T[:, :3, 3][:, None, :]), T
        t = chain_time(full, a, lambda o: jnp.sum(o), 8)
        print(f"  full estimate_init_translation: {t*1e3:8.2f} ms")

        def no_yaw(x, bb=bb, msk=msk):
            T = _hist.estimate_init_translation(
                x, msk, bb, msk, tf_dev, bin_w=cfg.hist_bin,
                lxy=cfg.hist_grid_xy, lz=cfg.hist_grid_z,
                topk=cfg.hist_topk, nms_kernel=cfg.hist_nms_kernel,
                eval_tile=cfg.nn_tile, yaws=(0.0,),
                coarse_cap=cfg.hist_coarse_cap, refine=cfg.hist_refine)
            return _chain_fold(x, T[:, :3, 3][:, None, :]), T
        t = chain_time(no_yaw, a, lambda o: jnp.sum(o), 8)
        print(f"  without yaw sweep:              {t*1e3:8.2f} ms")

        # pieces
        f32 = jnp.float32
        w = msk.astype(f32)
        c = jnp.sum(a * w[:, :, None], 1) / jnp.maximum(
            jnp.sum(w, 1), 1e-9)[:, None]

        @jax.jit
        def scatter2(x):
            g1 = _hist._wrap_counts(x, w, c, cfg.hist_bin, lxy, lxy, lz)
            g2 = _hist._wrap_counts(bb, w, c, cfg.hist_bin, lxy, lxy, lz)
            return g1, g2
        g1, g2 = scatter2(a)

        def sc_step(x):
            g1, g2 = scatter2(x)
            return _chain_fold(x, jnp.sum(g1) + jnp.sum(g2)), g1
        t = chain_time(sc_step, a, lambda o: jnp.sum(o), 8)
        print(f"  voxel scatter x2:               {t*1e3:8.2f} ms")

        @jax.jit
        def fftcorr(g1, g2):
            fa = jnp.fft.rfftn(g2, axes=(1, 2, 3))
            fb = jnp.fft.rfftn(g1, axes=(1, 2, 3))
            corr = jnp.fft.irfftn(fa * jnp.conj(fb), s=(lz, lxy, lxy),
                                  axes=(1, 2, 3))
            return jnp.roll(corr, (lz // 2, lxy // 2, lxy // 2),
                            axis=(1, 2, 3))
        corr0 = fftcorr(g1, g2)

        def fft_step(x):
            cr = fftcorr(g1 + x[0, 0, 0], g2)
            return _chain_fold(x, jnp.sum(cr)), cr
        t = chain_time(fft_step, a, lambda o: jnp.sum(o), 8)
        print(f"  FFT correlate + roll:           {t*1e3:8.2f} ms")

        @jax.jit
        def nms_topk(corr):
            kz = min(cfg.hist_nms_kernel, lz)
            pooled = corr
            for axis, k in ((1, kz), (2, cfg.hist_nms_kernel),
                            (3, cfg.hist_nms_kernel)):
                dims = [1, 1, 1, 1]
                dims[axis] = k
                pooled = jax.lax.reduce_window(
                    pooled, -jnp.inf, jax.lax.max,
                    window_dimensions=tuple(dims),
                    window_strides=(1, 1, 1, 1), padding="SAME")
            votes = jnp.where((corr >= pooled) & (corr > 0), corr, -1.0)
            tv, fi = jax.lax.top_k(votes.reshape(b, -1), cfg.hist_topk)
            return tv, fi

        def nms_step(x):
            tv, fi = nms_topk(corr0 + x[0, 0, 0])
            return _chain_fold(x, jnp.sum(tv)), tv
        t = chain_time(nms_step, a, lambda o: jnp.sum(o), 8)
        print(f"  NMS pool + top_k:               {t*1e3:8.2f} ms")

        # hypothesis scoring: K = topk + 2 candidates, no yaw
        K = cfg.hist_topk + 2
        tt = jnp.asarray(rng.normal(size=(K, b, 3)).astype(np.float32) * 0.1)

        @jax.jit
        def score(x, tt):
            moved = x[None] + tt[:, :, None, :]
            return _hist._select_hypothesis(
                moved, msk, bb, msk, cfg.nn_tile,
                coarse_cap=cfg.hist_coarse_cap, refine=cfg.hist_refine)

        def score_step(x):
            bi, be = score(x, tt)
            return _chain_fold(x, jnp.sum(be)), be
        t = chain_time(score_step, a, lambda o: jnp.sum(o), 8)
        print(f"  hypothesis scoring (K={K}):      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
