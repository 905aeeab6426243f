"""Measure the temporal lag of a rolled-out policy against its reference.

Cross-correlates the rollout's actuated-joint trajectory (from a
``pbrl rollout --out`` npz) with the reference clip in the lag domain:
for each candidate lag L (in policy steps, fractional via linear
interpolation), computes the mean squared joint error between ``qpos[t]``
and ``reference(t - L)``. Positive best-lag = the policy runs LATE.

Round-5 backflip finding (docs/BACKFLIP_EXPERIMENTS.md): the shipped
checkpoint's best alignment is at ~-2.75 steps (-44 ms, i.e. slightly
EARLY — consistent with the built-in t+policy_dt base-target lead) and the
SSE landscape is nearly flat, so the ceiling analysis's "25-30
ms-equivalent tracking error" is reward-equivalent SPATIAL looseness, not
a time shift. This falsified the feedforward-lead arm (campaign 31) at the
mechanism level.

Usage:
  JAX_PLATFORMS=cpu python scripts/measure_lag.py artifacts/backflip.npz backflip
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lag_sse(qpos: np.ndarray, ref: np.ndarray, lag: float) -> float:
    """MSE between qpos[t] and ref[t - lag] (linear interp, valid window)."""
    T = qpos.shape[0]
    ts = np.arange(T)
    src = ts - lag
    ok = (src >= 0) & (src <= T - 1)
    i0 = np.clip(np.floor(src[ok]).astype(int), 0, T - 2)
    w = src[ok] - i0
    ref_i = (1 - w)[:, None] * ref[i0] + w[:, None] * ref[i0 + 1]
    return float(np.mean((qpos[ok] - ref_i) ** 2))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pbrl_tpu.mocap import load_clip, reference_state

    npz, clip_name = sys.argv[1], sys.argv[2]
    d = np.load(npz)
    q = np.asarray(d["qpos"])
    dt = 1.0 / float(d["fps"])
    T = q.shape[0]
    clip = load_clip(clip_name)
    ref = np.stack([np.asarray(reference_state(clip, t * dt)[0])
                    for t in range(T)])

    joints = slice(7, q.shape[1])  # actuated joints; root excluded
    lags = np.arange(-3.0, 6.01, 0.25)
    sses = [lag_sse(q[:, joints], ref[:, joints], l) for l in lags]
    best = float(lags[int(np.argmin(sses))])
    out = {
        "npz": npz, "clip": clip_name, "steps": T,
        "best_lag_steps": best, "best_lag_ms": best * dt * 1000,
        "sse_at_zero": sses[int(np.argmin(np.abs(lags)))],
        "sse_at_best": min(sses),
        "lags_steps": lags.tolist(), "sse": [round(s, 5) for s in sses],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
