"""Device-side D2H slice tiers of the fused engine.

The slicers only run on real TPU in production (`if not self.interpret`),
so the engine parity tests never execute them — these unit tests check the
jitted slice functions against plain numpy slicing for every tier the
engine can pick (RCAPS x LCAPS, VRS).
"""
import numpy as np

from smoothxg_tpu.ops.poa_pallas_fused import (FusedPallasEngine,
                                               _exp_slicer, _paths_slicer)


def test_paths_slicer_matches_numpy():
    RW, LWr = 48, 16                       # 16*128 = 2048 columns
    rng = np.random.default_rng(0)
    paths = rng.integers(-4, 4, size=(3, RW * LWr, 128), dtype=np.int16)
    for rcap in FusedPallasEngine.RCAPS:
        for lcapr in [min(t // 128, LWr) for t in FusedPallasEngine.LCAPS]:
            out = np.asarray(_paths_slicer(RW, LWr, rcap, lcapr)(paths))
            ref = paths.reshape(3, RW, LWr, 128)[:, :rcap, :lcapr, :]
            assert out.shape == (3, rcap, lcapr, 128)
            np.testing.assert_array_equal(out, ref)
            # the decode step flattens the lane axis: row r's first L
            # columns must be the original row r's first L columns
            flat = out.reshape(3, rcap, -1)
            full = paths.reshape(3, RW, LWr * 128)
            np.testing.assert_array_equal(
                flat, full[:, :rcap, :lcapr * 128])


def test_exp_slicer_matches_numpy():
    VWr = 32                                # 4096-node export planes
    rng = np.random.default_rng(1)
    exp = rng.integers(0, 100, size=(5, 3 * VWr, 128), dtype=np.int16)
    for vr in FusedPallasEngine.VRS:
        vr = min(vr, VWr)       # the engine clamps vr to the tier's VWr
        out = np.asarray(_exp_slicer(VWr, vr)(exp))
        ref = exp.reshape(5, 3, VWr, 128)[:, :, :vr, :]
        assert out.shape == (5, 3, vr, 128)
        np.testing.assert_array_equal(out, ref)
        # decode reshapes to (B, 3, -1) and reads the first V entries
        flat = out.reshape(5, 3, -1)
        full = exp.reshape(5, 3, VWr * 128)
        np.testing.assert_array_equal(flat, full[:, :, :vr * 128])


def test_tier_selection_picks_smallest_cover():
    eng = object.__new__(FusedPallasEngine)   # no device init
    for maxr, want in [(1, 16), (16, 16), (17, 48), (48, 48)]:
        assert next((t for t in FusedPallasEngine.RCAPS if t >= maxr),
                    None) == want
    for maxl, want in [(100, 512), (512, 512), (513, 1024),
                       (1025, 1536), (1537, 2048), (2047, 2048)]:
        assert next((t for t in FusedPallasEngine.LCAPS if t >= maxl),
                    None) == want
    for maxv, want in [(100, 8), (1024, 8), (1025, 16), (2049, 24),
                       (3073, 32)]:
        assert next((t for t in FusedPallasEngine.VRS if t * 128 >= maxv),
                    None) == want
