#!/usr/bin/env python
"""Ablation timing of the flagship train step: attribute step time to
components by replacing each with a cheap stand-in (numerics change, cost
attribution doesn't). Scan-timed like bench.py.

Usage: python scripts/ablate_step.py [full|nopinv|noppeg|noresconv|fwdonly] ...
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(step_fn, state, batch, n_steps=10, reps=3):
    import os
    del os
    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, b, rng):
        def body(carry, i):
            st, _ = carry
            st, m = step_fn(st, b, jax.random.fold_in(rng, i))
            return (st, m["loss"]), None

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(n_steps)
        )
        return state, loss

    state, loss = multi(state, batch, jax.random.PRNGKey(1))
    float(loss)
    times = []
    for i in range(reps):
        t0 = time.time()
        state, loss = multi(state, batch, jax.random.PRNGKey(2 + i))
        float(loss)
        times.append((time.time() - t0) / n_steps)
    times.sort()
    return times[len(times) // 2]


import os


def build(fwd_only=False):
    from scripts.profile_step import build_step

    batch = int(os.environ.get("ABLATE_BATCH", "64"))
    return build_step(batch, use_pallas=True, fwd_only=fwd_only)


KNOWN_MODES = {"full", "fwdonly", "nopinv", "noppeg", "noresconv"}


def main():
    modes = sys.argv[1:] or ["full"]
    unknown = [m for m in modes if m not in KNOWN_MODES]
    if unknown:
        raise SystemExit(
            f"unknown ablation mode(s) {unknown}; choose from "
            f"{sorted(KNOWN_MODES)} — a typo would silently time the FULL "
            "step under the wrong label"
        )
    import mirror_tpu.models.nystrom as nystrom_mod
    import mirror_tpu.models.transmil as transmil_mod

    import mirror_tpu.ops.pinv_pallas as pinv_mod

    results = {}
    for mode in modes:
        orig_pinv = nystrom_mod.moore_penrose_pinv
        orig_pinv_pallas = pinv_mod.moore_penrose_pinv_pallas
        orig_ppeg_call = transmil_mod.PPEG.__call__
        try:
            if mode == "nopinv":
                import mirror_tpu.ops.pinv_pallas as pp

                nystrom_mod.moore_penrose_pinv = (
                    lambda x, iters=6: jnp.swapaxes(x, -1, -2)
                )
                pp.moore_penrose_pinv_pallas = (
                    lambda x, iters=6, grad="exact": jnp.swapaxes(x, -1, -2)
                )
            elif mode == "noppeg":
                transmil_mod.PPEG.__call__ = lambda self, x, h, w: x
            elif mode == "noresconv":
                nystrom_mod._ABLATE_RES_CONV = True
            step, state, batch = build(fwd_only=(mode == "fwdonly"))
            bsz = batch["wsi"].shape[0]
            dt = timed(step, state, batch)
            results[mode] = dt
            print(f"{mode:12s} {dt*1000:8.1f} ms/step   {bsz/dt:8.1f} samples/s",
                  flush=True)
        finally:
            nystrom_mod.moore_penrose_pinv = orig_pinv
            pinv_mod.moore_penrose_pinv_pallas = orig_pinv_pallas
            nystrom_mod._ABLATE_RES_CONV = False
            transmil_mod.PPEG.__call__ = orig_ppeg_call
    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"{k}: saves {(base - v)*1000:.1f} ms ({100*(base-v)/base:.1f}%)")


if __name__ == "__main__":
    main()
