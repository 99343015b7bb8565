"""Inspect the loss-second-moment resampler state inside an Orbax checkpoint.

Evidence companion for the on-chip --time_sampler loss-second-moment e2e
leg: restores the TrainState written by the real CLI in a NEW process and
prints the resampler history facts that prove (a) the state warmed up,
(b) the learned importance distribution is genuinely non-uniform, and
(c) it survives the checkpoint round-trip — the capability the reference
defines but never wires (reference: tools/resample.py:132-162).

Usage: python probes/_lsm_inspect.py <ckpt_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    path = os.path.abspath(sys.argv[1])
    import orbax.checkpoint as ocp

    try:
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(path)
    except Exception:  # older orbax needs the PyTree handler for raw restore
        with ocp.PyTreeCheckpointer() as ckptr:
            state = ckptr.restore(path)

    def get(tree, key):
        return tree[key] if isinstance(tree, dict) else getattr(tree, key)

    res = get(state, "resampler")
    hist = np.asarray(get(res, "loss_history"))  # [T, H]
    counts = np.asarray(get(res, "loss_counts"))  # [T]
    T, H = hist.shape
    warmed = bool((counts == H).all())
    print(f"step={int(np.asarray(get(state, 'step')))} T={T} H={H}")
    print(f"warmed_up={warmed} counts min/max={counts.min()}/{counts.max()}")

    # The sampler's actual distribution (core/weighting.py weights()):
    w = np.sqrt((hist.astype(np.float64) ** 2).mean(axis=-1))
    w = w / w.sum()
    w = w * (1 - 0.001) + 0.001 / T
    ess = 1.0 / (T * (w ** 2).sum())  # effective sample size fraction
    print(f"weight min={w.min():.3e} max={w.max():.3e} "
          f"max/min={w.max() / w.min():.1f} ess_frac={ess:.3f}")
    hi = np.argsort(w)[-5:][::-1]
    lo = np.argsort(w)[:5]
    print("top-5 t by weight:", [(int(t), round(float(w[t]), 5)) for t in hi])
    print("bottom-5 t by weight:",
          [(int(t), round(float(w[t]), 5)) for t in lo])
    # sqrt-E[loss^2] per t, coarse profile over 10 bands
    band = np.sqrt((hist ** 2).mean(axis=-1)).reshape(10, T // 10).mean(axis=1)
    print("sqrt-E[loss^2] per-t profile (10 bands, t=0..T):",
          [round(float(b), 4) for b in band])


if __name__ == "__main__":
    main()
