"""Regression cover for ``scripts/bench_featgen_e2e.py`` (the e2e feat-gen
benchmark artifact, VERDICT r3 next #6): the script once broke silently on
the real chip — tracing the extractor closure inside its timing scan
embedded all backbone weights as HLO constants and the remote-compile
service rejected the program (HTTP 413) — and nothing caught it because no
test ran the script. This runs it in-process on tiny shapes and asserts the
JSON schema plus sane rate relationships.

Under the 8-virtual-device conftest mesh, batch 8 divides over 8 devices
and `build_extractor` takes the data-parallel branch (no `.raw` chain hook
-> the loop-rate fallback); the single-device chain path is covered
separately by pinning `data_parallel=False` via the module's build call.
"""

import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_featgen_e2e", os.path.join(REPO, "scripts", "bench_featgen_e2e.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_featgen_e2e_schema(tmp_path, capsys, monkeypatch):
    mod = _load_bench()
    monkeypatch.setattr(
        sys, "argv",
        ["bench_featgen_e2e.py", "--model", "custom_resnet50",
         "--batch-size", "8", "--slides", "1", "--patches-per-slide", "16",
         "--num-threads", "2", "--device-reps", "2",
         "--keep", str(tmp_path / "work")],
    )
    mod.main()
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 1, lines  # driver contract: ONE JSON line
    r = json.loads(lines[0])
    assert r["metric"] == "featgen_e2e" and r["unit"] == "patches/s"
    for k in ("value", "host_decode_patches_per_s",
              "device_compute_patches_per_s", "ship_mb_per_s",
              "ship_patches_per_s", "device_loop_patches_per_s",
              "v5e8_extrapolated_patches_per_s"):
        assert r[k] > 0, (k, r)
    assert r["patches"] == 16
    assert 0 <= r["host_busy_fraction"] <= 1
    assert 0 <= r["device_busy_fraction"] <= 1
    # the extrapolation can never exceed 8x the compute ceiling or
    # cores x the decode ceiling (2% slack: the reported rates are rounded
    # and host timing under CI load is noisy)
    assert r["v5e8_extrapolated_patches_per_s"] <= min(
        r["host_decode_patches_per_s"] * r["host_cores"],
        r["device_compute_patches_per_s"] * 8,
    ) * 1.02
    assert r["bound_by"]  # always labeled


def test_chain_uses_weights_as_jit_args():
    """The single-device wrapper must expose .raw/.variables so timing
    chains can pass weights as jit ARGUMENTS — re-tracing through the
    closure embeds them as HLO literal constants (the 413 failure mode),
    and the two call forms must agree."""
    import numpy as np

    from mirror_tpu.tools.gen_patch_feature import build_extractor

    fn, dim = build_extractor("custom_resnet50", data_parallel=False)
    assert fn.raw is not None and fn.variables is not None
    imgs = np.random.default_rng(0).integers(
        0, 255, (2, 224, 224, 3), dtype=np.uint8
    )
    a = np.asarray(fn(imgs))
    b = np.asarray(fn.raw(fn.variables, imgs))
    assert a.shape == (2, dim)
    np.testing.assert_allclose(a, b)
