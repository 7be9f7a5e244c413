"""Config-knob liveness: every ElvisConfig field is either LIVE (has a
call site in the framework) or explicitly ABSORBED (declared in
ABSORBED_FIELDS with the reason it has no counterpart).

The reference accumulated silently-inert knobs across its generations
(SURVEY.md §2.9); VERDICT r1/r2 both flagged the same class here. This
test makes the inertness audit permanent: adding a field without wiring
it (or documenting its absorption) fails CI.

The behavioral tests below then verify the newly-wired knobs actually
change what runs: mask dilation, non-local reference frames
(ref_stride/num_ref), resize-ratio inpainting, per-stage frame chunks,
per-stage device subsets, and fp32 SR inference.
"""

import dataclasses
import os
import re

import numpy as np
import pytest
import jax.numpy as jnp

from elvis_tpu.pipeline.config import ABSORBED_FIELDS, ElvisConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "elvis_tpu")


def _package_source_without_config():
    chunks = []
    for root, _, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            if path.endswith(os.path.join("pipeline", "config.py")):
                continue
            if path.endswith("presley.py"):
                # presley's OWN dataclass re-declares reference names;
                # its declarations are not ElvisConfig call sites
                continue
            with open(path) as fh:
                chunks.append(fh.read())
    return "\n".join(chunks)


class TestFieldLiveness:
    def test_every_field_live_or_absorbed(self):
        src = _package_source_without_config()
        fields = [f.name for f in dataclasses.fields(ElvisConfig)]
        missing = []
        for name in fields:
            if name in ABSORBED_FIELDS:
                continue
            # attribute access, getattr string, or dict-key string
            pat = rf"(\.{name}\b|[\"']{name}[\"'])"
            if not re.search(pat, src):
                missing.append(name)
        assert not missing, (
            f"ElvisConfig fields with no call site and no ABSORBED_FIELDS "
            f"entry (wire them or document the absorption): {missing}"
        )

    def test_absorbed_fields_have_no_call_sites(self):
        """The absorbed list must stay honest: an absorbed field that
        gains a call site should be promoted to live (removed from the
        list), not shadow-wired."""
        src = _package_source_without_config()
        stale = []
        for name in sorted(ABSORBED_FIELDS):
            pat = rf"(config\.{name}\b|getattr\(config,\s*[\"']{name}[\"'])"
            if re.search(pat, src):
                stale.append(name)
        assert not stale, f"ABSORBED_FIELDS entries with call sites: {stale}"

    def test_absorbed_fields_are_declared(self):
        declared = {f.name for f in dataclasses.fields(ElvisConfig)}
        assert ABSORBED_FIELDS <= declared


class TestDilateBlockMask:
    def test_radius_one_square(self):
        from elvis_tpu.core.blocks import dilate_block_mask

        m = np.zeros((1, 5, 5), bool)
        m[0, 2, 2] = True
        out = np.asarray(dilate_block_mask(jnp.asarray(m), 1))
        assert out[0, 1:4, 1:4].all()
        assert out.sum() == 9

    def test_no_wraparound(self):
        from elvis_tpu.core.blocks import dilate_block_mask

        m = np.zeros((1, 4, 4), bool)
        m[0, 0, 0] = True
        out = np.asarray(dilate_block_mask(jnp.asarray(m), 1))
        assert not out[0, -1, :].any() and not out[0, :, -1].any()
        assert out[0, :2, :2].all()

    def test_radius_zero_identity(self):
        from elvis_tpu.core.blocks import dilate_block_mask

        m = np.random.default_rng(0).random((2, 6, 7)) < 0.3
        np.testing.assert_array_equal(
            np.asarray(dilate_block_mask(jnp.asarray(m), 0)), m
        )


def _holed_clip(n=8, h=16, w=16, b=8):
    """Bright top-left block, removed in frames 2.., clean only in 0/1."""
    clip = np.full((n, h, w, 3), 40, np.uint8)
    clip[:, 0:b, 0:b] = 200
    mask = np.zeros((n, h // b, w // b), np.int8)
    mask[2:, 0, 0] = 1
    holed = clip.copy()
    holed[2:, 0:b, 0:b] = 0
    return clip, mask, holed


class TestRefStride:
    def test_global_refs_fill_beyond_window(self):
        """A hole whose nearest clean source is beyond the local window
        fills from a non-local reference frame when ref_stride engages
        (ProPainter's global reference set), and PDE-fills otherwise."""
        from elvis_tpu.restore.inpaint import restore_removal_temporal

        clip, mask, holed = _holed_clip()
        kw = dict(block_size=8, window=1, motion_radius=0)
        without = np.asarray(
            restore_removal_temporal(jnp.asarray(holed), jnp.asarray(mask), **kw)
        )
        with_refs = np.asarray(
            restore_removal_temporal(
                jnp.asarray(holed), jnp.asarray(mask), ref_stride=8, **kw
            )
        )
        # frame 5 is >window from any clean frame: refs recover the bright
        # content, the windowed-only variant diffuses toward the surround
        assert abs(float(with_refs[5, 2:6, 2:6].mean()) - 200) < 2
        assert float(without[5, 2:6, 2:6].mean()) < 150

    def test_num_ref_caps_the_reference_set(self):
        from elvis_tpu.restore.inpaint import restore_removal_temporal

        # clean source only at frame 4 (ref index 4 with stride 4);
        # capping refs to 1 keeps only frame 0, which is ALSO holed.
        n, b = 8, 8
        clip = np.full((n, b, b, 3), 40, np.uint8)
        clip[:, :, :] = 40
        clip[4] = 200
        mask = np.ones((n, 1, 1), np.int8)
        mask[4] = 0
        holed = clip.copy()
        holed[mask[:, 0, 0] > 0] = 0
        kw = dict(block_size=8, window=1, motion_radius=0, ref_stride=4)
        uncapped = np.asarray(
            restore_removal_temporal(jnp.asarray(holed), jnp.asarray(mask),
                                     max_refs=-1, **kw)
        )
        capped = np.asarray(
            restore_removal_temporal(jnp.asarray(holed), jnp.asarray(mask),
                                     max_refs=1, **kw)
        )
        # uncapped: frame 0's hole fills from ref frame 4 (bright)
        assert abs(float(uncapped[0].mean()) - 200) < 2
        assert not np.array_equal(uncapped, capped)

    def test_backend_provenance_records_ref_stride(self):
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        _, prov = resolve_inpaint_backend(
            "temporal", ElvisConfig(propainter_ref_stride=6)
        )
        assert "ref_stride=6" in prov


class TestMaskDilation:
    def test_dilation_extends_the_restored_region(self):
        """mask_dilation >= block_size treats a 1-block border around each
        hole as hole too: pixels in that border get rewritten."""
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        clip, mask, holed = _holed_clip(n=4, h=24, w=24)
        # corrupt the pixels just right of the hole; plain restore keeps
        # them (not masked), dilated restore rewrites them
        holed[2, 0:8, 8:16] = 255
        plain, _ = resolve_inpaint_backend(
            "temporal", ElvisConfig(propainter_mask_dilation=0)
        )
        dilated, _ = resolve_inpaint_backend(
            "temporal", ElvisConfig(propainter_mask_dilation=8)
        )
        out_plain = np.asarray(plain(jnp.asarray(holed), jnp.asarray(mask), 8))
        out_dil = np.asarray(dilated(jnp.asarray(holed), jnp.asarray(mask), 8))
        assert float(out_plain[2, 0:8, 8:16].mean()) == 255.0
        assert float(out_dil[2, 0:8, 8:16].mean()) < 250.0

    def test_default_dilation_is_subblock_noop(self):
        """The reference default (4 px) rounds to 0 blocks at b=8: output
        identical to the undilated restorer."""
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        clip, mask, holed = _holed_clip(n=4, h=24, w=24)
        d0, _ = resolve_inpaint_backend(
            "temporal", ElvisConfig(propainter_mask_dilation=0)
        )
        d4, _ = resolve_inpaint_backend("temporal", ElvisConfig())
        np.testing.assert_array_equal(
            np.asarray(d0(jnp.asarray(holed), jnp.asarray(mask), 8)),
            np.asarray(d4(jnp.asarray(holed), jnp.asarray(mask), 8)),
        )


class TestResizeRatio:
    def test_holes_filled_known_pixels_untouched(self):
        from elvis_tpu.restore.backends import resolve_inpaint_backend

        clip, mask, holed = _holed_clip(n=4, h=32, w=32)
        fn, _ = resolve_inpaint_backend(
            "temporal", ElvisConfig(propainter_resize_ratio=0.5)
        )
        out = np.asarray(fn(jnp.asarray(holed), jnp.asarray(mask), 8))
        assert out.shape == holed.shape and out.dtype == holed.dtype
        hole = np.repeat(np.repeat(mask, 8, 1), 8, 2)[..., None] > 0
        np.testing.assert_array_equal(out[~hole[..., 0]], holed[~hole[..., 0]])
        # the half-res restore still recovers the bright block content
        assert float(out[3, 2:6, 2:6].mean()) > 150


class TestFrameChunkKnob:
    def test_chunk_override_bounds_the_chunk(self):
        from elvis_tpu.pipeline.run import _DataParallel

        def fn(x):
            return x

        fn.frame_chunk = 3
        assert _DataParallel._chunk_frames((100, 8, 8, 3), fn) == 3
        # the pixel-budget bound still wins when smaller
        fn.frame_chunk = 10**6
        auto = _DataParallel._chunk_frames((100, 1080, 1920, 3))
        assert _DataParallel._chunk_frames((100, 1080, 1920, 3), fn) == auto

    def test_chunked_apply_is_exact_for_per_frame_ops(self, rng):
        from elvis_tpu.pipeline.run import _DataParallel

        dp = _DataParallel(enabled=False)
        x = (rng.random((7, 8, 8, 3)) * 255).astype(np.float32)

        def op(a):
            return a * 2.0 + 1.0

        op.frame_chunk = 2
        out = np.asarray(dp.apply(op, x))
        np.testing.assert_allclose(out, x * 2.0 + 1.0)

    def test_backends_carry_frame_chunk(self):
        from elvis_tpu.restore.backends import (
            resolve_deblur_backend,
            resolve_inpaint_backend,
            resolve_sr_backend,
        )

        fn, _ = resolve_inpaint_backend(
            "temporal", ElvisConfig(propainter_parallel_chunk_length=5)
        )
        assert fn.frame_chunk == 5
        fn, _ = resolve_inpaint_backend(
            "neural",
            ElvisConfig(e2fgvi_parallel_chunk_length=4, auto_load_checkpoints=False),
        )
        assert fn.frame_chunk == 4
        fn, _ = resolve_sr_backend(
            "progressive_neural",
            ElvisConfig(realesrgan_parallel_chunk_length=6,
                        auto_load_checkpoints=False),
        )
        assert fn.frame_chunk == 6
        fn, _ = resolve_deblur_backend(
            "unsharp", ElvisConfig(instantir_parallel_chunk_length=3)
        )
        assert fn.frame_chunk == 3


class TestDeviceSubsets:
    def test_submesh_spans_only_configured_devices(self):
        import jax

        from elvis_tpu.pipeline.run import _DataParallel

        dp = _DataParallel(enabled=True)
        sub = dp._mesh_for([0, 1])
        assert sub is not None and sub.devices.size == 2
        ids = {d.id for d in sub.devices.flat}
        assert ids == {0, 1}
        assert dp._mesh_for(None) is dp.mesh
        assert dp.mesh.devices.size == len(jax.devices())

    def test_apply_on_subset_matches_full(self, rng):
        from elvis_tpu.pipeline.run import _DataParallel

        dp = _DataParallel(enabled=True)
        x = (rng.random((6, 8, 8, 3)) * 255).astype(np.float32)

        def op(a):
            return a + 1.0

        full = np.asarray(dp.apply(op, x))
        sub = np.asarray(dp.apply(op, x, devices=[0, 1]))
        np.testing.assert_array_equal(full, sub)

    def test_single_device_subset_degrades_to_chunked(self, rng):
        from elvis_tpu.pipeline.run import _DataParallel

        dp = _DataParallel(enabled=True)
        x = (rng.random((4, 8, 8, 3)) * 255).astype(np.float32)
        out = np.asarray(dp.apply(lambda a: a * 0.5, x, devices=[2]))
        np.testing.assert_allclose(out, x * 0.5)


class TestFp32Flag:
    def test_provenance_records_fp32(self):
        from elvis_tpu.restore.backends import resolve_sr_backend

        ckpt = os.path.join(REPO, "checkpoints", "srnet_compact")
        if not os.path.isdir(ckpt):
            pytest.skip("no shipped SR checkpoint")
        _, prov = resolve_sr_backend(
            "srnet_compact", ElvisConfig(realesrgan_fp32=True)
        )
        assert "+fp32" in prov
        _, prov_off = resolve_sr_backend("srnet_compact", ElvisConfig())
        assert "+fp32" not in prov_off


class TestInstantirSeed:
    def test_seed_reaches_diffusion_provenance(self):
        from elvis_tpu.restore.backends import resolve_deblur_backend

        ckpt = os.path.join(REPO, "checkpoints", "diffusion")
        if not os.path.isdir(ckpt):
            pytest.skip("no shipped diffusion checkpoint")
        fn, prov = resolve_deblur_backend(
            "diffusion", ElvisConfig(instantir_seed=7, instantir_batch_size=2)
        )
        assert "seed=7" in prov
        assert fn.frame_chunk == 2
