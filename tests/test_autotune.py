"""Plumbing tests for the startup kernel-formulation autotune."""

import jax
import numpy as np
import pytest

from gs_tpu.config import RasterizeConfig
from gs_tpu.ops import autotune, rasterize_pallas as rp


@pytest.fixture(autouse=True)
def restore_formulation():
    snap, mode = rp.get_formulation(), rp.KERNEL_MODE
    yield
    rp.apply_formulation(snap)
    rp.KERNEL_MODE = mode


def _fake_timer(times):
    calls = []

    def timer(state, camera, cfg, steps):
        name = (f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}")
        calls.append(name)
        return times[name]

    return timer, calls


def test_picks_winner_and_sets_globals():
    timer, calls = _fake_timer(
        {"mxu-chunk": 0.05, "vpu-chunk": 0.02, "mxu-tile": 0.08})
    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, tune_chunk=False, tune_movement=False,
        log=lambda s: None)
    assert res["winner"] == "vpu-chunk"
    assert res["cfg"].chunk == 64
    assert calls == ["mxu-chunk", "vpu-chunk", "mxu-tile"]
    assert rp.SCAN_MXU is False and rp.KERNEL_MODE == "chunk"


def test_movement_phase_keeps_faster_carry():
    from gs_tpu.ops import rasterize_tiled as rt

    assert rt.PAIR_SOURCE == "gather"

    def timer(state, camera, cfg, steps):
        name = f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}"
        base = {"mxu-chunk": 0.05, "vpu-chunk": 0.02, "mxu-tile": 0.08}[name]
        return base * (0.7 if rt.PAIR_SOURCE == "carry" else 1.0)

    try:
        res = autotune.autotune_formulation(
            None, None, RasterizeConfig(backend="pallas"),
            timer=timer, force=True, tune_chunk=False, log=lambda s: None)
        assert res["winner"] == "vpu-chunk+carry"
        assert rt.PAIR_SOURCE == "carry"
    finally:
        rt.PAIR_SOURCE = "gather"


def test_movement_phase_restores_when_slower():
    from gs_tpu.ops import rasterize_tiled as rt

    def timer(state, camera, cfg, steps):
        name = f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}"
        base = {"mxu-chunk": 0.05, "vpu-chunk": 0.02, "mxu-tile": 0.08}[name]
        return base * (1.4 if rt.PAIR_SOURCE == "carry" else 1.0)

    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, tune_chunk=False, log=lambda s: None)
    assert res["winner"] == "vpu-chunk"
    assert rt.PAIR_SOURCE == "gather"


def test_tile_winner_sets_kernel_mode():
    timer, _ = _fake_timer(
        {"mxu-chunk": 0.05, "vpu-chunk": 0.06, "mxu-tile": 0.01})
    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, tune_chunk=False, log=lambda s: None)
    assert res["winner"] == "mxu-tile"
    assert rp.SCAN_MXU is True and rp.KERNEL_MODE == "tile"


def test_chunk_phase_picks_faster_chunk():
    def timer(state, camera, cfg, steps):
        name = f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}"
        base = {"mxu-chunk": 0.05, "vpu-chunk": 0.07, "mxu-tile": 0.08}[name]
        # chunk 32 is 2x faster for the winning formulation
        return base * (0.5 if cfg.chunk == 32 else 1.0)

    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, log=lambda s: None)
    assert res["winner"] == "mxu-chunk-c32"
    assert res["cfg"].chunk == 32
    assert rp.SCAN_MXU is True and rp.KERNEL_MODE == "chunk"


def test_skips_off_tpu_and_non_pallas():
    boom = lambda *a: (_ for _ in ()).throw(AssertionError("timed"))
    # xla backend: skipped regardless of platform
    assert autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="xla"), timer=boom) is None
    # pallas backend but CPU host (this suite): interpret timings are
    # meaningless -> skipped
    if jax.default_backend() != "tpu":
        assert autotune.autotune_formulation(
            None, None, RasterizeConfig(backend="pallas"), timer=boom) is None


def test_all_candidates_failing_restores_and_continues():
    # a candidate compile failure must NOT kill training at startup
    # (VERDICT r4 item 4): all-fail -> restore the configured formulation,
    # warn, return None
    def timer(state, camera, cfg, steps):
        raise RuntimeError("compile failed")

    before, mode = rp.get_formulation(), rp.KERNEL_MODE
    logs = []
    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, log=logs.append)
    assert res is None
    assert rp.get_formulation() == before and rp.KERNEL_MODE == mode
    assert any("failed" in line for line in logs)


def test_one_failing_candidate_is_skipped_not_fatal():
    # one candidate dying mid-sweep disqualifies only itself; the sweep
    # still picks the best of the survivors
    def timer(state, camera, cfg, steps):
        name = f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}"
        if name == "mxu-tile":
            raise RuntimeError("Mosaic compile failed")
        return {"mxu-chunk": 0.05, "vpu-chunk": 0.02}[name]

    logs = []
    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, tune_chunk=False, log=logs.append)
    assert res["winner"] == "vpu-chunk"
    assert res["mxu-tile"] == float("inf")
    assert rp.SCAN_MXU is False and rp.KERNEL_MODE == "chunk"
    assert any("mxu-tile failed" in line for line in logs)


def test_scan_prec_phase_keeps_faster_high():
    if rp._ENV_FORMULATION["_SCAN_PREC"] != "highest":
        pytest.skip("GS_TPU_SCAN_PREC already overridden in the env")

    def timer(state, camera, cfg, steps):
        name = f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}"
        base = {"mxu-chunk": 0.05, "vpu-chunk": 0.07, "mxu-tile": 0.08}[name]
        # the 2-pass tri contraction is 20% faster on this fake scene
        return base * (0.8 if rp._SCAN_PREC == "high" else 1.0)

    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, tune_chunk=False, log=lambda s: None)
    assert res["winner"] == "mxu-chunk-sphigh"
    assert rp._SCAN_PREC == "high"


def test_scan_prec_phase_restores_when_slower():
    if rp._ENV_FORMULATION["_SCAN_PREC"] != "highest":
        pytest.skip("GS_TPU_SCAN_PREC already overridden in the env")

    def timer(state, camera, cfg, steps):
        name = f"{'mxu' if rp.SCAN_MXU else 'vpu'}-{rp.KERNEL_MODE}"
        base = {"mxu-chunk": 0.05, "vpu-chunk": 0.07, "mxu-tile": 0.08}[name]
        return base * (1.2 if rp._SCAN_PREC == "high" else 1.0)

    res = autotune.autotune_formulation(
        None, None, RasterizeConfig(backend="pallas"),
        timer=timer, force=True, tune_chunk=False, log=lambda s: None)
    assert res["winner"] == "mxu-chunk"
    assert rp._SCAN_PREC == "highest"


def test_formulation_snapshot_roundtrip():
    # set_formulation must restore env-derived precisions (the bench A/B
    # restore bug, ADVICE r3); _DOT_PREC is orthogonal to the A/B (the
    # color dots ride the MXU under both formulations) and must survive
    # a flip in either direction; snapshot API is exact
    snap = rp.get_formulation()
    rp.set_formulation(False)
    assert rp.get_formulation()["_DOT_PREC"] == rp._ENV_FORMULATION["_DOT_PREC"]
    rp.set_formulation(True)
    assert rp.get_formulation()["_DOT_PREC"] == rp._ENV_FORMULATION["_DOT_PREC"]
    rp.apply_formulation(snap)
    assert rp.get_formulation() == snap
