"""Codec boundary tests: byte-exact ROI files, NVC codec, sidecars, Y4M,
and external-encoder argv recipes via the fake-codec shim."""

import json
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from elvis_tpu.codec import (
    NvcCodec,
    QUALITY_PRESETS,
    calculate_target_bitrate,
    decode_strength_maps,
    encode_strength_maps,
    load_removal_masks_npz,
    read_y4m,
    save_removal_masks_npz,
    select_ctu_size,
    write_kvazaar_roi,
    write_svtav1_roi,
    write_x265_qpfile,
    write_y4m,
)
from elvis_tpu.codec.nvc import entropy


class TestEntropy:
    def test_native_available(self):
        assert entropy.native_available(), "C++ range coder must build in CI"

    def test_coeff_roundtrip_extremes(self, rng):
        c = np.zeros(64 * 32, dtype=np.int16)
        c[0] = 32767
        c[1] = -32767
        c[64] = 1
        c[-1] = -1
        bk, pl = entropy.encode_coeffs(c, 64)
        np.testing.assert_array_equal(entropy.decode_coeffs(bk, pl, c.size, 64), c)

    def test_compresses_sparse_data(self, rng):
        c = (rng.standard_normal(64 * 256) * 2).astype(np.int16)
        c[rng.random(c.size) < 0.8] = 0
        bk, pl = entropy.encode_coeffs(c, 64)
        assert len(pl) < c.size * 2 * 0.25  # at least 4x vs raw int16

    def test_all_zero_blocks_tiny(self):
        c = np.zeros(64 * 1024, dtype=np.int16)
        bk, pl = entropy.encode_coeffs(c, 64)
        assert len(pl) < 200

    def test_bytes_roundtrip(self, rng):
        b = rng.integers(0, 255, 5000).astype(np.uint8)
        bk, pl = entropy.encode_bytes(b)
        np.testing.assert_array_equal(entropy.decode_bytes(bk, pl, b.size), b)


def _oracle_kvazaar_roi(importance_scores, base_qp, qp_range):
    """Direct port of utils.py:1026-1053."""
    out = b""
    for importance in importance_scores:
        h, w = importance.shape
        out += np.array([w, h], dtype=np.int32).tobytes()
        dqp = (1.0 - importance) * 2 * qp_range - qp_range
        dqp = np.clip(dqp, -14, 14)
        dqp = np.clip(dqp, 0 - base_qp, 51 - base_qp)
        out += dqp.astype(np.int8).tobytes()
    return out


def _oracle_svtav1_lines(importance_scores, base_crf, qp_range, rows, cols):
    """utils.py:1074-1092 with pre-gridded maps (no resize needed)."""
    lines = []
    for idx, imp in enumerate(importance_scores):
        levels = np.clip((imp * 8).astype(np.int32), 0, 7)
        dqp = qp_range - (levels * 2 * qp_range // 7)
        dqp = np.clip(dqp, 0 - base_crf, 63 - base_crf)
        lines.append(f"{idx} " + " ".join(map(str, dqp.flatten().astype(int))))
    return lines


class TestRoiFiles:
    def test_kvazaar_byte_exact(self, tmp_path, rng):
        scores = [rng.random((4, 6)) for _ in range(3)]
        p = tmp_path / "roi.bin"
        write_kvazaar_roi(str(p), scores, base_qp=48, qp_range=15)
        assert p.read_bytes() == _oracle_kvazaar_roi(scores, 48, 15)

    def test_kvazaar_format_structure(self, tmp_path):
        imp = np.array([[1.0, 0.0]])
        p = tmp_path / "roi.bin"
        write_kvazaar_roi(str(p), [imp], base_qp=30, qp_range=15)
        blob = p.read_bytes()
        w, h = struct.unpack("<ii", blob[:8])
        assert (w, h) == (2, 1)
        dqp = np.frombuffer(blob[8:], dtype=np.int8)
        # imp=1 -> -15 clamped to -14; imp=0 -> +15 clamped to +14
        np.testing.assert_array_equal(dqp, [-14, 14])

    def test_svtav1_line_exact(self, tmp_path, rng):
        rows, cols = 2, 3  # pretend 128x192 at 64px superblocks
        scores = [rng.random((rows, cols)).astype(np.float32) for _ in range(2)]
        p = tmp_path / "roi.txt"
        write_svtav1_roi(str(p), scores, base_crf=35, qp_range=15, width=192, height=128)
        got = p.read_text().strip().split("\n")
        assert got == _oracle_svtav1_lines(scores, 35, 15, rows, cols)

    def test_ctu_selection(self):
        # elvis.py:2032-2052 semantics
        assert select_ctu_size(16, 1280, 720) == 16
        assert select_ctu_size(8, 1280, 720) == 16
        # nearest(24) ties to 16, but 16 < block_size forces the next size up
        assert select_ctu_size(24, 1280, 720) == 32
        assert select_ctu_size(33, 1280, 720) == 64  # 32 < 33 -> next size up
        assert select_ctu_size(16, 3840, 2160) == 32
        assert select_ctu_size(16, 7680, 4320) == 64

    def test_qpfile_lines(self, tmp_path):
        scores = np.stack([np.full((2, 2), 0.0), np.full((2, 2), 1.0)])
        p = tmp_path / "qpfile.txt"
        ctu = write_x265_qpfile(str(p), scores, block_size=16, width=32, height=32)
        assert ctu == 16
        lines = p.read_text().strip().split("\n")
        assert lines[0] == "0 P -1 0,0,-1.0000 1,0,-1.0000 0,1,-1.0000 1,1,-1.0000"
        assert lines[1] == "1 P -1 0,0,1.0000 1,0,1.0000 0,1,1.0000 1,1,1.0000"


class TestNvc:
    def test_roundtrip_quality_ladder(self, tiny_video):
        codec = NvcCodec()
        prev_size, prev_mse = None, None
        for qp in (12, 28, 44):
            stream = codec.encode(tiny_video, qp=qp, framerate=24.0)
            dec, fps = codec.decode(stream)
            assert fps == 24.0
            assert dec.shape == tiny_video.shape and dec.dtype == np.uint8
            mse = float(np.mean((dec.astype(np.float64) - tiny_video.astype(np.float64)) ** 2))
            if prev_size is not None:
                assert len(stream) < prev_size  # higher qp -> fewer bits
                assert mse > prev_mse  # ... and more distortion
            prev_size, prev_mse = len(stream), mse

    def test_probe_header(self, tiny_video):
        codec = NvcCodec()
        stream = codec.encode(tiny_video, qp=30, framerate=24.0)
        info = codec.probe(stream)
        assert (info.width, info.height, info.num_frames) == (64, 48, 5)
        assert info.framerate == 24.0 and not info.has_roi

    def test_bitrate_targeting(self, tiny_video):
        codec = NvcCodec()
        target = 150_000
        stream = codec.encode(tiny_video, target_bitrate=target, framerate=24.0)
        actual = len(stream) * 8 / (5 / 24.0)
        assert 0.4 * target < actual < 2.5 * target

    def test_bitrate_targeting_long_clip_prefix_probes(self, rng, monkeypatch):
        """Long clips rate-target via prefix probes: at most one
        full-length encode in the common case (plus one corrective pass
        on a gross miss), and the result still lands near the target."""
        import elvis_tpu.codec.nvc.codec as M

        n = 56
        frames = (rng.random((n, 32, 48, 3)) * 255).astype(np.uint8)
        codec = NvcCodec()
        # calibrate a reachable target from a mid-QP encode of this clip
        target = int(len(codec.encode(frames, qp=26, framerate=24.0,
                                      gop=8)) * 8 / (n / 24.0))

        full_calls = []
        orig = M.encode

        def counting(fr, **kw):
            if fr.shape[0] == n:
                full_calls.append(kw.get("qp"))
            return orig(fr, **kw)

        monkeypatch.setattr(M, "encode", counting)
        stream = codec.encode(frames, target_bitrate=target,
                              framerate=24.0, gop=8)
        assert len(full_calls) <= 2  # 1 normally, 2 only on a gross miss
        actual = len(stream) * 8 / (n / 24.0)
        assert 0.4 * target < actual < 2.5 * target
        dec, _ = codec.decode(stream)
        assert dec.shape == frames.shape

    def test_roi_shifts_quality(self, tiny_video):
        codec = NvcCodec()
        delta = np.full((5, 6, 8), 8, dtype=np.int8)
        delta[:, 2:4, 3:5] = -8
        stream = codec.encode(tiny_video, qp=32, framerate=24.0, roi_delta_qp=delta)
        info = codec.probe(stream)
        assert info.has_roi
        dec, _ = codec.decode(stream)
        err = (dec.astype(np.float64) - tiny_video.astype(np.float64)) ** 2
        err_blocks = err.reshape(5, 6, 8, 8, 8, 3).mean(axis=(3, 4, 5))
        roi_err = err_blocks[:, 2:4, 3:5].mean()
        rest = (err_blocks.sum() - err_blocks[:, 2:4, 3:5].sum()) / (5 * 6 * 8 - 5 * 4)
        assert roi_err < rest

    def test_inter_prediction_helps_static_clips(self, rng):
        frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        static = np.stack([frame] * 6)
        moving = np.stack([np.roll(frame, 7 * t, axis=1) for t in range(6)])
        codec = NvcCodec()
        s_static = codec.encode(static, qp=28, framerate=24.0)
        s_moving = codec.encode(moving, qp=28, framerate=24.0)
        assert len(s_static) < 0.5 * len(s_moving)

    def test_non_multiple_of_16_dims(self, rng):
        clip = (rng.random((3, 50, 70, 3)) * 255).astype(np.uint8)
        codec = NvcCodec()
        dec, _ = codec.decode(codec.encode(clip, qp=28, framerate=30.0))
        assert dec.shape == clip.shape


class TestSidecars:
    def test_strength_maps_roundtrip(self, rng):
        maps = rng.integers(0, 11, (7, 6, 8)).astype(np.uint8)
        blob = encode_strength_maps(maps)
        np.testing.assert_array_equal(decode_strength_maps(blob), maps)
        assert len(blob) < maps.size

    def test_removal_masks_roundtrip(self, tmp_path, rng):
        masks = rng.random((7, 6, 8)) > 0.7
        p = tmp_path / "masks.npz"
        save_removal_masks_npz(masks, str(p))
        np.testing.assert_array_equal(load_removal_masks_npz(str(p)), masks)


class TestY4m:
    def test_roundtrip(self, tmp_path, tiny_video):
        p = tmp_path / "clip.y4m"
        write_y4m(tiny_video, str(p), 24.0)
        frames, fps = read_y4m(str(p))
        assert fps == 24.0
        assert frames.shape == tiny_video.shape
        # 4:2:0 chroma subsampling: luma near-exact
        from elvis_tpu.ops.color import rgb_to_gray

        g0 = np.asarray(rgb_to_gray(jnp.asarray(tiny_video.astype(np.float32))))
        g1 = np.asarray(rgb_to_gray(jnp.asarray(frames.astype(np.float32))))
        assert np.abs(g0 - g1).mean() < 2.5

    def test_header_format(self, tmp_path, tiny_video):
        p = tmp_path / "clip.y4m"
        write_y4m(tiny_video[:1], str(p), 23.976)
        header = p.read_bytes().split(b"\n")[0]
        assert header == b"YUV4MPEG2 W64 H48 F23976:1000 Ip A1:1 C420"


class TestExternalShim:
    def test_x265_two_pass_argv(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ELVIS_TPU_FAKE_CODECS", str(tmp_path / "fake"))
        from elvis_tpu.codec.external import encode_video_x265

        out = tmp_path / "out.mp4"
        encode_video_x265(str(tmp_path / "frames"), str(out), 24.0, 640, 360,
                          target_bitrate=1_000_000, ctu=32, qpfile="qp.txt")
        argv = [json.loads(l) for l in (tmp_path / "fake" / "argv.jsonl").read_text().splitlines()]
        assert len(argv) == 2
        p1, p2 = argv
        assert p1[0] == "ffmpeg" and "-b:v" in p1 and "1000000" in p1
        assert "-minrate" in p1 and "900000" in p1 and "1100000" in p1
        x265_1 = p1[p1.index("-x265-params") + 1]
        assert "pass=1" in x265_1 and "qpfile" not in x265_1 and "ctu=32" in x265_1
        x265_2 = p2[p2.index("-x265-params") + 1]
        assert "pass=2" in x265_2 and "qpfile=qp.txt" in x265_2
        assert p2[-1] == str(out) and out.exists()

    def test_kvazaar_pipeline_argv(self, tmp_path, monkeypatch, rng):
        monkeypatch.setenv("ELVIS_TPU_FAKE_CODECS", str(tmp_path / "fake"))
        from elvis_tpu.codec.external import encode_kvazaar

        frames = [(rng.random((32, 32, 3)) * 255).astype(np.uint8)]
        scores = [rng.random((2, 2))]
        out = tmp_path / "video.mp4"
        encode_kvazaar(frames, str(out), 24.0, qp=35, importance_scores=scores)
        argv = [json.loads(l) for l in (tmp_path / "fake" / "argv.jsonl").read_text().splitlines()]
        tools = [a[0] for a in argv]
        assert tools == ["kvazaar", "mkvmerge", "ffmpeg"]
        assert "--roi" in argv[0] and "-q" in argv[0]
        assert "--default-duration" in argv[1] and "0:24fps" in argv[1]
        assert "copy" in argv[2]


class TestPresetsAndBitrate:
    def test_presets_match_reference_values(self):
        # utils.py:54-60
        assert QUALITY_PRESETS["high"]["kvazaar_qp"] == 30
        assert QUALITY_PRESETS["medium"]["kvazaar_qp"] == 35
        assert QUALITY_PRESETS["low"]["kvazaar_qp"] == 38
        assert QUALITY_PRESETS["lowest"]["kvazaar_qp"] == 42

    def test_bitrate_model(self):
        # elvis.py:857-862: W*H*fps*0.01*qf
        assert calculate_target_bitrate(640, 360, 30, 1.2) == int(640 * 360 * 30 * 0.012)


class TestMotionCompensation:
    def test_me_beats_zero_motion_on_panning(self, rng):
        """A panning clip (pure translation) should cost far fewer bits
        with motion search than with zero-motion prediction."""
        from elvis_tpu.codec import NvcCodec

        frame = (rng.random((64, 96, 3)) * 200 + 20).astype(np.uint8)
        pan = np.stack(
            [np.roll(np.roll(frame, 3 * t, axis=1), t, axis=0) for t in range(6)]
        )
        codec = NvcCodec()
        s_zero = codec.encode(pan, qp=30, framerate=24.0, me_radius=0)
        s_me = codec.encode(pan, qp=30, framerate=24.0, me_radius=4, me_step=1)
        assert len(s_me) < 0.75 * len(s_zero), (len(s_me), len(s_zero))
        dec, _ = codec.decode(s_me)
        assert dec.shape == pan.shape

    def test_mv_roundtrip_deterministic(self, tiny_video):
        from elvis_tpu.codec import NvcCodec

        codec = NvcCodec()
        s1 = codec.encode(tiny_video, qp=30, framerate=24.0)
        s2 = codec.encode(tiny_video, qp=30, framerate=24.0)
        assert s1 == s2
        dec, fps = codec.decode(s1)
        assert dec.shape == tiny_video.shape and fps == 24.0

    def test_encoder_decoder_recon_sync(self, tiny_video):
        """The encoder's in-loop reconstruction must equal the decoder's
        output exactly (any prediction mismatch = drift)."""
        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.transform import decode_plane, encode_plane
        from elvis_tpu.ops.color import rgb_to_yuv420

        y, _, _ = rgb_to_yuv420(jnp.asarray(tiny_video).astype(jnp.float32))
        qp = jnp.full((5, 6, 8), 30, jnp.int32)
        levels, modes, mvs, recons = encode_plane(y, qp)
        dec = decode_plane(levels, modes, mvs, qp, 48, 64)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recons), atol=1e-4)

    def test_halfpel_beats_integer_me_on_subpixel_pan(self):
        """Band-limited content panning 0.5 px/frame: half-pel refinement
        must code cheaper than integer-only motion."""
        from elvis_tpu.codec import NvcCodec

        # band-limited parent (no energy near hi-res Nyquist), sampled at
        # even/odd phases -> true half-pel shifts of the same signal
        yy, xx = np.mgrid[0:64, 0:400].astype(np.float32)
        hi = (
            128
            + 60 * np.sin(2 * np.pi * xx / 64) * np.cos(2 * np.pi * yy / 24)
            + 40 * np.sin(2 * np.pi * (xx + 2 * yy) / 90)
        )
        frames = np.stack([hi[:, t : t + 192 : 2] for t in range(8)])
        clip = np.repeat(np.clip(frames, 0, 255).astype(np.uint8)[..., None], 3, -1)
        codec = NvcCodec()
        s_half = codec.encode(clip, qp=30, framerate=24.0, me_halfpel=True)
        s_int = codec.encode(clip, qp=30, framerate=24.0, me_halfpel=False)
        assert len(s_half) < 0.9 * len(s_int), (len(s_half), len(s_int))

    def test_hierarchical_me_beats_capped_search_on_fast_pan(self, rng):
        """12 px/frame pan is out of reach for the dense radius-7 search;
        the hierarchical coarse-to-fine path (radius > 7) must code it
        markedly cheaper with zero encoder/decoder drift."""
        import jax
        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.transform import decode_plane, encode_plane

        h, w, n = 64, 96, 4
        base = (rng.random((h, w + 3 * 16)) * 255).astype(np.float32)
        plane = jnp.asarray(np.stack([base[:, 12 * t : 12 * t + w] for t in range(n)]))
        qp = jnp.full((n, h // 8, w // 8), 30, jnp.int32)
        enc = jax.jit(encode_plane, static_argnums=(2, 3, 4, 5))

        costs = {}
        for radius in (7, 16):
            lv, modes, mvs, recons = enc(plane, qp, 0, radius, 1, True)
            reach = max(1, -(-int(np.abs(np.asarray(mvs)).max()) // 16))
            dec = decode_plane(lv, modes, mvs, qp, h, w, reach=reach)
            np.testing.assert_allclose(np.asarray(dec), np.asarray(recons), atol=1e-4)
            costs[radius] = float(jnp.abs(lv).sum())
        assert costs[16] < 0.6 * costs[7], costs

    def test_long_range_me_through_container(self, rng):
        """me_radius > 7 through NvcCodec.encode/decode: the decoder
        derives the prediction reach from the stream's vectors."""
        from elvis_tpu.codec import NvcCodec

        base = (rng.random((64, 184, 3)) * 200 + 20).astype(np.uint8)
        pan = np.stack([base[:, 10 * t : 10 * t + 144] for t in range(4)])
        codec = NvcCodec()
        s_short = codec.encode(pan, qp=30, framerate=24.0, me_radius=4)
        s_long = codec.encode(pan, qp=30, framerate=24.0, me_radius=16)
        assert len(s_long) < 0.8 * len(s_short), (len(s_long), len(s_short))
        dec, _ = codec.decode(s_long)
        assert dec.shape == pan.shape
        ref, _ = codec.decode(s_short)
        mse_long = float(np.mean((dec.astype(np.float32) - pan) ** 2))
        mse_short = float(np.mean((ref.astype(np.float32) - pan) ** 2))
        assert mse_long <= mse_short * 1.1, (mse_long, mse_short)

    def test_nvc_pipeline_codec_knobs_flow(self, tmp_path):
        """config-level nvc_b_frames / nvc_me_radius reach the NVC
        container through the dispatch layer."""
        from elvis_tpu.codec.dispatch import make_pipeline_codec

        c = make_pipeline_codec("nvc", str(tmp_path), 64, 48,
                                nvc_b_frames=True, nvc_me_radius=9,
                                nvc_multi_ref=True)
        assert c._kw == {"b_frames": True, "me_radius": 9, "multi_ref": True,
                         "deblock": True, "intra_pred": True}

    def test_dc_dpcm_saves_bytes_and_is_lossless(self, rng, monkeypatch):
        """DC-level DPCM (JPEG-style) is a lossless entropy-side
        transform: identical decoded pixels, smaller stream on
        smooth/photo-like content."""
        from elvis_tpu.codec import NvcCodec
        from elvis_tpu.codec.nvc import codec as nvc_codec

        yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
        smooth = np.clip(
            128 + 100 * np.sin(xx / 30.0) * np.cos(yy / 22.0) + 10 * rng.random((64, 96)),
            0, 255,
        ).astype(np.uint8)
        clip = np.repeat(smooth[None, ..., None], 3, -1).repeat(4, 0)
        codec = NvcCodec()
        # intra_pred off: spatial prediction (r4) already removes most DC
        # redundancy; this test isolates the DPCM entropy-side transform
        s_on = codec.encode(clip, qp=30, framerate=24.0, intra_pred=False)
        dec_on, _ = codec.decode(s_on)
        monkeypatch.setattr(nvc_codec, "_dc_dpcm", lambda *a: None)
        s_off = codec.encode(clip, qp=30, framerate=24.0, intra_pred=False)
        dec_off, _ = codec.decode(s_off)
        np.testing.assert_array_equal(dec_on, dec_off)  # lossless transform
        assert len(s_on) < 0.9 * len(s_off), (len(s_on), len(s_off))

    def test_b_frames_save_bits_on_motion(self, rng):
        """Bi-predicted odd frames + B QP offset: a panning clip must
        code cheaper than the P-only chain at near-equal quality."""
        from elvis_tpu.codec import NvcCodec

        frame = (rng.random((64, 96, 3)) * 200 + 20).astype(np.uint8)
        pan = np.stack([np.roll(frame, 3 * t, axis=1) for t in range(6)])
        codec = NvcCodec()
        s_p = codec.encode(pan, qp=30, framerate=24.0, me_radius=4)
        s_b = codec.encode(pan, qp=30, framerate=24.0, me_radius=4, b_frames=True)
        assert len(s_b) < 0.9 * len(s_p), (len(s_b), len(s_p))
        dp, _ = codec.decode(s_p)
        db, _ = codec.decode(s_b)
        mse_p = float(np.mean((dp.astype(np.float32) - pan) ** 2))
        mse_b = float(np.mean((db.astype(np.float32) - pan) ** 2))
        assert mse_b <= mse_p * 1.1, (mse_b, mse_p)

    def test_b_frames_roundtrip_odd_n_roi_gop(self, rng):
        """Odd frame count (tail B ref falls back to fwd), ROI map and
        GOP refresh all through the v3 container."""
        from elvis_tpu.codec import NvcCodec
        from elvis_tpu.codec.nvc.codec import luma_modes

        frame = (rng.random((64, 144, 3)) * 200 + 20).astype(np.uint8)
        pan = np.stack([np.roll(frame, 3 * t, axis=1) for t in range(7)])
        roi = rng.standard_normal((7, 8, 18)) * 4
        codec = NvcCodec()
        s = codec.encode(pan, qp=32, framerate=24.0, roi_delta_qp=roi, gop=4,
                         b_frames=True)
        dec, fps = codec.decode(s)
        assert dec.shape == pan.shape and fps == 24.0
        info = codec.probe(s)
        assert (info.width, info.height, info.num_frames) == (144, 64, 7)
        modes = luma_modes(s)
        # frame 4 crosses the gop=4 boundary -> reference frame 4 is intra
        # (mode 0 = raw intra, >= 4 = spatially-predicted intra since r4)
        intra_ok = lambda m: ((m == 0) | (m >= 4)).all()  # noqa: E731
        assert intra_ok(modes[0])
        assert intra_ok(modes[4])
        # B frames may use backward/bi modes (2/3); P frames never do
        assert not np.isin(modes[::2], (2, 3)).any()

    def test_gop_periodic_intra(self, rng):
        """gop=N forces intra refresh every N frames: a corrupted-prefix
        decode is impossible to test without bitstream surgery, but the
        mode maps must show full-intra frames at the period."""
        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.transform import encode_plane

        frame = (rng.random((32, 32)) * 255).astype(np.float32)
        clip = jnp.asarray(np.stack([frame] * 6))  # static: inter always wins
        qp = jnp.full((6, 4, 4), 28, jnp.int32)
        _, modes, _, _ = encode_plane(clip, qp, gop=3)
        m = np.asarray(modes)
        assert (m[0] == 0).all() and (m[3] == 0).all()  # intra refresh
        assert (m[1] == 1).all() and (m[4] == 1).all()  # static -> inter

    def test_gop_forwarded_through_container(self, rng):
        """Container-level GOP: NvcCodec.encode(gop=N) must actually produce
        periodic all-intra frames in the stream (regression: gop was written
        into the header but never forwarded to encode_plane)."""
        from elvis_tpu.codec import NvcCodec
        from elvis_tpu.codec.nvc.codec import luma_modes

        frame = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        clip = np.stack([frame] * 6)  # static: inter always wins when allowed
        codec = NvcCodec()
        stream = codec.encode(clip, qp=28, framerate=24.0, gop=3)
        m = luma_modes(stream)
        assert (m[0] == 0).all() and (m[3] == 0).all(), "GOP intra refresh missing"
        assert (m[1] == 1).all() and (m[4] == 1).all()
        dec, _ = codec.decode(stream)
        assert dec.shape == clip.shape


class TestVideoSidecarFile:
    def test_roundtrip(self, tmp_path, rng):
        from elvis_tpu.codec.sidecar import (
            load_strength_maps_video,
            save_strength_maps_video,
        )

        maps = (rng.random((6, 8, 10)) * 3).astype(np.uint8)
        p = str(tmp_path / "maps.nvsv")
        size = save_strength_maps_video(maps, p, framerate=24.0, qp=8)
        assert size == __import__("os").path.getsize(p)
        back = load_strength_maps_video(p)
        assert back.shape == maps.shape
        # lossy video sidecar: levels within 1 of the original
        assert np.abs(back.astype(int) - maps.astype(int)).max() <= 1


class TestRateMatchedExternal:
    """kvazaar/SVT-AV1 map target_bitrate -> QP/CRF through the NVC
    probe rate model (the reference's primary mode is bitrate-targeted
    two-pass encoding, elvis.py:1226-1322; fixed preset QPs made those
    rows rate-incomparable)."""

    def _frames(self, rng, n=6):
        return (rng.random((n, 48, 64, 3)) * 255).astype(np.uint8)

    def _kvz_args(self, tmp_path, monkeypatch, rng, target, tag):
        from elvis_tpu.codec.dispatch import KvazaarPipelineCodec

        fake = tmp_path / f"fake_{tag}"
        monkeypatch.setenv("ELVIS_TPU_FAKE_CODECS", str(fake))
        codec = KvazaarPipelineCodec(str(tmp_path / f"wd_{tag}"), 64, 48)
        codec.encode(self._frames(rng), target_bitrate=target,
                     framerate=24.0, gop=24)
        argv = [json.loads(l) for l in (fake / "argv.jsonl").read_text().splitlines()]
        kvz = [a for a in argv if a[0] == "kvazaar"][0]
        return kvz

    def test_kvazaar_qp_responds_to_target_bitrate(self, tmp_path, monkeypatch, rng):
        lo = self._kvz_args(tmp_path, monkeypatch, rng, 50_000, "lo")
        hi = self._kvz_args(tmp_path, monkeypatch, rng, 2_000_000, "hi")
        qp_lo = int(lo[lo.index("-q") + 1])
        qp_hi = int(hi[hi.index("-q") + 1])
        # fewer target bits -> coarser quantization
        assert qp_lo > qp_hi, (qp_lo, qp_hi)
        # gop forwarded as the intra period
        assert lo[lo.index("--period") + 1] == "24"

    def test_kvazaar_preset_qp_without_target(self, tmp_path, monkeypatch, rng):
        from elvis_tpu.codec.dispatch import KvazaarPipelineCodec

        fake = tmp_path / "fake_p"
        monkeypatch.setenv("ELVIS_TPU_FAKE_CODECS", str(fake))
        codec = KvazaarPipelineCodec(str(tmp_path / "wd_p"), 64, 48, quality="low")
        codec.encode(self._frames(rng), target_bitrate=None, framerate=24.0, gop=0)
        argv = [json.loads(l) for l in (fake / "argv.jsonl").read_text().splitlines()]
        kvz = [a for a in argv if a[0] == "kvazaar"][0]
        assert int(kvz[kvz.index("-q") + 1]) == QUALITY_PRESETS["low"]["kvazaar_qp"]
        assert "--period" not in kvz

    def test_svtav1_crf_responds_and_keyint(self, tmp_path, monkeypatch, rng):
        from elvis_tpu.codec.dispatch import SvtAv1PipelineCodec

        fake = tmp_path / "fake_s"
        monkeypatch.setenv("ELVIS_TPU_FAKE_CODECS", str(fake))
        codec = SvtAv1PipelineCodec(str(tmp_path / "wd_s"), 64, 48)
        frames = self._frames(rng)
        codec.encode(frames, target_bitrate=50_000, framerate=24.0, gop=12)
        codec.encode(frames, target_bitrate=2_000_000, framerate=24.0, gop=12)
        argv = [json.loads(l) for l in (fake / "argv.jsonl").read_text().splitlines()]
        svt = [a for a in argv if a[0] == "SvtAv1EncApp"]
        crf_lo = int(svt[0][svt[0].index("--crf") + 1])
        crf_hi = int(svt[1][svt[1].index("--crf") + 1])
        assert crf_lo > crf_hi, (crf_lo, crf_hi)
        assert 1 <= crf_hi <= crf_lo <= 63
        assert svt[0][svt[0].index("--keyint") + 1] == "12"

    def test_rate_model_tracks_nvc_scale(self, rng):
        """The chosen HEVC QP should roughly reproduce the target when the
        NVC codec itself encodes at it (the model's own consistency)."""
        from elvis_tpu.codec.dispatch import _RateModel
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode

        frames = self._frames(rng, n=6)
        target = 400_000
        qp = _RateModel().hevc_qp(frames, target, 24.0)
        bits = len(nvc_encode(frames, qp=qp, framerate=24.0)) * 8
        achieved = bits / (frames.shape[0] / 24.0)
        assert 0.4 * target < achieved < 2.5 * target, (qp, achieved)


class TestBFrameValidation:
    def test_b_qp_offset_range_enforced(self, rng):
        """Header packs (1 + b_qp_offset) into one byte: -1 would alias
        'P-only' and corrupt decode; >254 overflows (ADVICE r2)."""
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode

        frames = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
        for bad in (-1, 255):
            with pytest.raises(ValueError):
                nvc_encode(frames, qp=32, b_frames=True, b_qp_offset=bad)
        # P-only path ignores the field entirely
        nvc_encode(frames, qp=32, b_frames=False, b_qp_offset=-1)


class TestMultiRefP:
    """Two-reference P prediction (mode MODE_INTER_REF2): per-block
    choice between the previous and two-back reconstructions — the
    reference chain extension of the B-frame machinery (round-3 agenda;
    H.264 multiple reference frames)."""

    def _flicker_clip(self, rng, n=8):
        """Even frames: clean texture. Odd frames: the same texture with a
        large moving occluder — so even frames match their TWO-BACK
        reference far better than the occluded previous frame. The base is
        spatially smooth (per-pixel color noise would hit the 4:2:0
        chroma floor and mask coding quality)."""
        yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
        base = np.stack([
            128 + 90 * np.sin(2 * np.pi * (xx + 17 * c) / 48)
            * np.cos(2 * np.pi * (yy - 9 * c) / 40)
            for c in range(3)
        ], axis=-1)
        base = np.clip(base + rng.normal(0, 2, base.shape), 0, 255).astype(np.uint8)
        frames = []
        for t in range(n):
            f = base.copy()
            if t % 2 == 1:
                x0 = 8 * (t % 5)
                f[:, x0 : x0 + 40] = 255 - f[:, x0 : x0 + 40]
            frames.append(f)
        return np.stack(frames)

    def test_multi_ref_saves_bits_on_flicker(self, rng):
        from elvis_tpu.codec.nvc.codec import decode as nvc_decode
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode
        from elvis_tpu.metrics import masked_psnr

        import jax.numpy as jnp

        clip = self._flicker_clip(rng)
        s1 = nvc_encode(clip, qp=30, me_radius=4)
        s2 = nvc_encode(clip, qp=30, me_radius=4, multi_ref=True)
        d1, _ = nvc_decode(s1)
        d2, _ = nvc_decode(s2)
        p1 = float(masked_psnr(jnp.asarray(clip, jnp.float32),
                               jnp.asarray(d1, jnp.float32)).mean())
        p2 = float(masked_psnr(jnp.asarray(clip, jnp.float32),
                               jnp.asarray(d2, jnp.float32)).mean())
        # the two-back reference must pay: >=10% fewer bytes at >= equal PSNR
        assert len(s2) < 0.9 * len(s1), (len(s2), len(s1))
        assert p2 >= p1 - 0.1, (p2, p1)

    def test_multi_ref_stream_roundtrip_deterministic(self, rng):
        from elvis_tpu.codec.nvc.codec import decode as nvc_decode
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode
        from elvis_tpu.codec.nvc.codec import luma_modes

        clip = self._flicker_clip(rng, n=7)
        s = nvc_encode(clip, qp=28, me_radius=4, multi_ref=True, gop=4)
        modes = luma_modes(s)
        assert (modes == 2).any()  # mode 2 actually used
        d_a, fps = nvc_decode(s)
        d_b, _ = nvc_decode(s)
        np.testing.assert_array_equal(d_a, d_b)
        assert d_a.shape == clip.shape and fps == 30.0

    @pytest.mark.slow
    def test_multi_ref_with_b_frames_roundtrip(self, rng):
        """Slow-marked: the combined multi_ref+b_frames graph is a
        compile-heavy variant (82 s single-core); each feature's
        roundtrip is covered separately in the non-slow set."""
        from elvis_tpu.codec.nvc.codec import decode as nvc_decode
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode
        from elvis_tpu.metrics import masked_psnr

        import jax.numpy as jnp

        clip = self._flicker_clip(rng, n=8)
        s = nvc_encode(clip, qp=30, me_radius=4, b_frames=True, multi_ref=True)
        d, _ = nvc_decode(s)
        p = float(masked_psnr(jnp.asarray(clip, jnp.float32),
                              jnp.asarray(d, jnp.float32)).mean())
        assert d.shape == clip.shape and p > 25, p

    def test_plain_stream_unaffected(self, tiny_video):
        """multi_ref=False streams carry no mode 2 and decode through the
        single-reference path byte-identically to before."""
        from elvis_tpu.codec.nvc.codec import decode as nvc_decode
        from elvis_tpu.codec.nvc.codec import encode as nvc_encode
        from elvis_tpu.codec.nvc.codec import luma_modes

        s = nvc_encode(tiny_video, qp=30, me_radius=2)
        assert not (luma_modes(s) == 2).any()
        d, _ = nvc_decode(s)
        assert d.shape == tiny_video.shape


class TestBModeBitEstimate:
    @pytest.mark.slow
    def test_bits_cost_beats_l1_on_occlusion(self, rng):
        """The calibrated bit-estimate B-mode decision (B_MODE_COST=
        'bits', mv charge scale 0.5) must beat the round-2 L1 proxy in
        BYTES at >= PSNR on occlusion/flicker content — the measured
        result that made it the default (round-3 agenda)."""
        import elvis_tpu.codec.nvc.transform as T
        from elvis_tpu.codec.nvc import codec as C

        yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
        base = np.clip(np.stack([
            128 + 80 * np.sin(2 * np.pi * (xx + 13 * c) / 37)
            * np.cos(2 * np.pi * (yy - 7 * c) / 29)
            + 20 * np.sin(2 * np.pi * xx / 7)
            for c in range(3)
        ], -1) + rng.normal(0, 3, (64, 96, 3)), 0, 255).astype(np.uint8)
        frames = []
        for t in range(10):
            f = base.copy()
            if t % 2 == 1:
                x0 = 10 * (t % 5)
                f[:, x0:x0 + 40] = np.clip(
                    255 - f[:, x0:x0 + 40].astype(int), 0, 255
                ).astype(np.uint8)
            frames.append(f)
        clip = np.stack(frames)

        def run():
            C._encode_planes_jit.clear_cache()
            s = C.encode(clip, qp=30, me_radius=4, b_frames=True)
            d, _ = C.decode(s)
            mse = ((d.astype(np.float64) - clip) ** 2).mean()
            return len(s), 10 * np.log10(255**2 / mse)

        old = T.B_MODE_COST
        try:
            T.B_MODE_COST = "bits"
            b_bytes, b_psnr = run()
            T.B_MODE_COST = "l1"
            l_bytes, l_psnr = run()
        finally:
            T.B_MODE_COST = old
            C._encode_planes_jit.clear_cache()
        assert b_bytes < 0.98 * l_bytes, (b_bytes, l_bytes)
        assert b_psnr >= l_psnr - 0.05, (b_psnr, l_psnr)


class TestChunkedEncode:
    """Bounded-memory segment encoding (one lax.scan per segment with a
    cross-segment reference carry) must be BIT-EXACT vs the single-scan
    path — it exists because a clip-sized scan holds every frame's
    coefficients in HBM (measured OOM at 128 frames @1080p)."""

    def _clip(self, rng, n=7):
        frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        return np.stack([np.roll(frame, 3 * t, axis=1) for t in range(n)])

    @pytest.mark.parametrize("multi_ref", [False, True])
    @pytest.mark.parametrize("gop", [0, 4])
    def test_bit_exact_vs_single_scan(self, rng, gop, multi_ref):
        from elvis_tpu.codec.nvc import codec as nvc_codec

        clip = self._clip(rng)
        kw = dict(qp=30, framerate=24.0, gop=gop, me_radius=4,
                  multi_ref=multi_ref)
        single = nvc_codec.encode(clip, **kw)
        # chunk 3 over 7 frames = 3+3+1: covers the uneven tail segment
        # in the same encode (was a second chunk_frames=2 encode; the
        # non-slow suite budget, VERDICT r3 #8)
        chunked = nvc_codec.encode(clip, chunk_frames=3, **kw)
        assert chunked == single

    def test_chunked_decode_matches(self, rng, monkeypatch):
        from elvis_tpu.codec.nvc import codec as nvc_codec

        clip = self._clip(rng)
        stream = nvc_codec.encode(clip, qp=30, framerate=24.0, gop=4,
                                  me_radius=4)
        full, fps = nvc_codec.decode(stream)
        # force the decode chunking path (auto budget never trips on
        # test-sized frames)
        monkeypatch.setattr(nvc_codec, "_CHUNK_PIXEL_BUDGET", 48 * 64 * 3)
        chunked, fps2 = nvc_codec.decode(stream)
        assert fps2 == fps
        np.testing.assert_array_equal(chunked, full)

    def test_roi_and_rate_paths_unchanged(self, tiny_video):
        """chunk_frames flows through NvcCodec.encode kwargs unchanged."""
        codec = NvcCodec()
        s1 = codec.encode(tiny_video, qp=30, framerate=24.0)
        s2 = codec.encode(tiny_video, qp=30, framerate=24.0, chunk_frames=2)
        assert s1 == s2


class TestLevelPacking:
    """The encode graphs bitcast two int16 levels into one f32 word to
    halve the device->host coefficient pull (the measured encode
    bottleneck at 1080p); ``_unpack_levels`` must invert ``_pack_levels``
    exactly over the full int16 domain — including values whose packed
    bit pattern is a float NaN/Inf payload."""

    def test_roundtrip_full_domain(self):
        import jax

        from elvis_tpu.codec.nvc import codec as nvc_codec

        rng = np.random.default_rng(7)
        lv = rng.integers(-32768, 32768, size=(3, 2, 5, 64)).astype(np.float32)
        # force the adversarial patterns: extremes and NaN-payload pairs
        lv[0, 0, 0, :8] = [-32768, 32767, 0, -1, 1, 255, -256, 32767]
        lv[0, 0, 1, :2] = [1, 0x7FC0]  # packs to 0x7fc00001 (quiet NaN)
        packed = jax.jit(nvc_codec._pack_levels)(jnp.asarray(lv))
        assert packed.dtype == jnp.float32
        assert packed.shape == (3, 2, 5, 32)
        out = nvc_codec._unpack_levels(np.asarray(packed))
        np.testing.assert_array_equal(out, lv.astype(np.int16))


class TestDeblock:
    """In-loop deblocking (transform.deblock_plane, header flag 0x02):
    H.264-style QP-adaptive weak filter on every reference
    reconstruction, applied identically by encoder and decoder."""

    def _gradient_clip(self, n=10, h=96, w=144):
        yy, xx = np.mgrid[0:h, 0:w]
        clip = np.stack(
            [np.clip(60 + 0.6 * xx + 0.4 * yy + 2 * t, 0, 255) for t in range(n)]
        )
        return np.repeat(clip[..., None], 3, -1).astype(np.uint8)

    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255 * 255 / mse)

    def test_filter_smooths_quantization_steps_keeps_real_edges(self):
        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.transform import deblock_plane, qstep_from_qp

        qs_map = qstep_from_qp(jnp.full((2, 2), 40, jnp.int32))
        qstep = float(qs_map[0, 0])
        # small step at the block boundary (quantization-sized): smoothed
        plane = np.full((16, 16), 100.0, np.float32)
        plane[:, 8:] = 100.0 + 0.5 * qstep
        out = np.asarray(deblock_plane(jnp.asarray(plane), qs_map))
        assert abs(out[0, 8] - out[0, 7]) < 0.5 * qstep
        # large step (real content edge, > threshold): untouched
        plane2 = np.full((16, 16), 60.0, np.float32)
        plane2[:, 8:] = 200.0
        out2 = np.asarray(deblock_plane(jnp.asarray(plane2), qs_map))
        np.testing.assert_array_equal(out2, plane2)

    def test_encoder_decoder_recon_sync_with_deblock(self, tiny_video):
        """Drift check: the filtered encoder reconstruction must equal the
        decoder's filtered output exactly."""
        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.transform import decode_plane, encode_plane
        from elvis_tpu.ops.color import rgb_to_yuv420

        y, _, _ = rgb_to_yuv420(jnp.asarray(tiny_video).astype(jnp.float32))
        qp = jnp.full((5, 6, 8), 40, jnp.int32)
        levels, modes, mvs, recons = encode_plane(y, qp, deblock=True)
        dec = decode_plane(levels, modes, mvs, qp, 48, 64, deblock=True)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(recons), atol=1e-4)

    def test_container_flag_roundtrip_and_gain_at_low_rate(self):
        """The header flag engages the decoder filter; on smooth-gradient
        content at low rate the in-loop filter must GAIN PSNR (the
        blocking artifact case it exists for)."""
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._gradient_clip()
        s_off = C.encode(rgb, qp=44, gop=8, deblock=False)
        s_on = C.encode(rgb, qp=44, gop=8, deblock=True)
        # flags byte: bit 0 roi (absent), bit 1 deblock
        assert s_off[5] == 0 and s_on[5] == 2
        d_off, _ = C.decode(s_off)
        d_on, _ = C.decode(s_on)
        assert self._psnr(rgb, d_on) > self._psnr(rgb, d_off) + 0.5

    def test_default_streams_unchanged(self, tiny_video):
        """deblock/intra_pred default ON since r4; switching both off must
        reproduce the pre-r4 stream bytes exactly (modulo the version
        byte, which always advances to announce decoder capability)."""
        from elvis_tpu.codec.nvc import codec as C

        legacy = C.encode(tiny_video, qp=32, deblock=False, intra_pred=False)
        default = C.encode(tiny_video, qp=32)
        assert legacy != default  # the new tools actually engage
        # legacy stream: flags bit 1 clear, no spatial-intra modes anywhere
        assert legacy[5] & 2 == 0
        assert (C.luma_modes(legacy) < 4).all()
        d1, _ = C.decode(legacy)
        d2, _ = C.decode(default)
        assert d1.shape == d2.shape == tiny_video.shape

    def test_chunked_encode_decode_bit_exact_with_deblock(self, rng):
        """The segment boundary carries the FILTERED reference: chunked
        encode and decode must stay bit-exact vs single-scan."""
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._gradient_clip(n=9, h=48, w=64)
        single = C.encode(rgb, qp=40, gop=4, deblock=True)
        chunked = C.encode(rgb, qp=40, gop=4, deblock=True, chunk_frames=3)
        assert single == chunked
        d1, _ = C.decode(single)
        # force the chunked decode path too
        import elvis_tpu.codec.nvc.codec as codec_mod
        orig = codec_mod._chunk_frames_for
        try:
            codec_mod._chunk_frames_for = lambda n, h, w, c: 3
            d2, _ = codec_mod.decode(single)
        finally:
            codec_mod._chunk_frames_for = orig
        np.testing.assert_array_equal(d1, d2)

    def test_b_frames_with_deblock_roundtrip(self, rng):
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._gradient_clip(n=9, h=48, w=64)
        s = C.encode(rgb, qp=40, gop=4, b_frames=True, deblock=True)
        d, _ = C.decode(s)
        assert d.shape == rgb.shape
        assert self._psnr(rgb, d) > 28

    def test_knob_flows_from_config(self, tmp_path):
        from elvis_tpu.codec.dispatch import make_pipeline_codec

        c = make_pipeline_codec("nvc", str(tmp_path), 64, 48, nvc_deblock=True)
        assert c._kw["deblock"] is True


class TestIntraPrediction:
    """Spatial intra prediction on keyframes (transform._intra_frame_encode,
    modes 4-6, r4): HEVC-style neighbour prediction — the reference's
    wrapped encoders (x265/kvazaar/SVT-AV1) all ship it; NVC keyframes
    were raw DCT until round 4."""

    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255 * 255 / max(mse, 1e-12))

    def _smooth_clip(self, n=6, h=96, w=128):
        """Sharp vertical stripes over a mild ramp — the case spatial
        prediction exists for: the vertical predictor continues the
        structure almost exactly while a raw DCT pays for every stripe
        edge in every block (measured 5x fewer bytes at equal PSNR).
        On SMOOTH gradients the frame arbiter legitimately stays raw:
        at real QPs the reconstructed top rows are too quantized for
        extrapolation to beat DC-DPCM (that rejection is itself tested
        in test_smooth_gradient_stays_raw)."""
        yy, xx = np.mgrid[0:h, 0:w]
        base = 60 + 130 * ((xx // 5) % 2) + 0.2 * yy
        frames = [np.clip(base + 1.5 * t, 0, 255) for t in range(n)]
        return np.repeat(np.stack(frames)[..., None], 3, -1).astype(np.uint8)

    def test_wavefront_encode_decode_mirror(self):
        """_intra_frame_decode must reproduce _intra_frame_encode's recon
        exactly (same wavefront, same predictor arithmetic)."""
        import jax.numpy as jnp

        from elvis_tpu.codec.nvc.transform import (
            _blocks_of, _intra_frame_decode, _intra_frame_encode,
            qstep_from_qp)

        rng = np.random.default_rng(3)
        plane = np.clip(
            np.cumsum(rng.normal(0, 8, (64, 96)), axis=0) + 128, 0, 255
        ).astype(np.float32)
        blocks = _blocks_of(jnp.asarray(plane))
        qs = qstep_from_qp(jnp.full(blocks.shape[:2], 36, jnp.int32))
        lv, modes, rec = _intra_frame_encode(blocks, qs)
        dec = _intra_frame_decode(lv.astype(jnp.float32), modes, qs)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(rec), atol=1e-3)

    def test_modes_appear_and_roundtrip(self):
        """On smooth content the encoder must actually pick spatial modes,
        the stream must round-trip, and quality must hold."""
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._smooth_clip()
        s = C.encode(rgb, qp=32, gop=1)  # all-intra
        modes = C.luma_modes(s)
        assert (modes >= 4).any(), "no spatial intra mode selected"
        dec, _ = C.decode(s)
        assert self._psnr(rgb, dec) > 34

    def test_smooth_gradient_stays_raw(self):
        """On a SMOOTH luma gradient at a real QP the frame-level arbiter
        must reject spatial prediction: the reconstructed top rows are
        quantization-noisy (qstep ~51 at qp38), extrapolation amplifies
        that noise, and DC-DPCM already codes the smooth DC evolution —
        measured raw frame cost < spatial. The arbiter exists exactly so
        such content cannot regress."""
        from elvis_tpu.codec.nvc import codec as C

        yy, xx = np.mgrid[0:96, 0:128]
        frames = [np.clip(40 + 1.4 * yy + 0.3 * xx + 1.5 * t, 0, 255)
                  for t in range(4)]
        rgb = np.repeat(np.stack(frames)[..., None], 3, -1).astype(np.uint8)
        s = C.encode(rgb, qp=38, gop=1)
        assert (C.luma_modes(s) < 4).all()
        d, _ = C.decode(s)
        assert self._psnr(rgb, d) > 36

    def test_saves_bytes_at_equal_or_better_quality(self):
        """The RD win the feature exists for: on an I-frame-heavy stream,
        spatial prediction must cut bytes without losing PSNR."""
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._smooth_clip()
        s_on = C.encode(rgb, qp=38, gop=1, intra_pred=True)
        s_off = C.encode(rgb, qp=38, gop=1, intra_pred=False)
        d_on, _ = C.decode(s_on)
        d_off, _ = C.decode(s_off)
        p_on, p_off = self._psnr(rgb, d_on), self._psnr(rgb, d_off)
        assert len(s_on) < 0.95 * len(s_off), (len(s_on), len(s_off))
        assert p_on >= p_off - 0.1, (p_on, p_off)

    def test_legacy_streams_have_no_spatial_modes(self, tiny_video):
        from elvis_tpu.codec.nvc import codec as C

        s = C.encode(tiny_video, qp=36, intra_pred=False)
        assert (C.luma_modes(s) < 4).all()

    def test_chunked_bit_exact_with_intra_pred(self, rng):
        """Segment boundaries force intra frames; the spatially-predicted
        wavefront is frame-local so chunked encode stays bit-exact."""
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._smooth_clip(n=9, h=48, w=64)
        single = C.encode(rgb, qp=38, gop=4)
        chunked = C.encode(rgb, qp=38, gop=4, chunk_frames=3)
        assert single == chunked

    def test_b_frames_with_intra_pred_roundtrip(self):
        from elvis_tpu.codec.nvc import codec as C

        rgb = self._smooth_clip(n=9, h=48, w=64)
        s = C.encode(rgb, qp=38, gop=4, b_frames=True)
        d, _ = C.decode(s)
        assert d.shape == rgb.shape
        assert self._psnr(rgb, d) > 30

    def test_roi_qp_map_with_intra_pred(self, tiny_video):
        """Per-block ROI QP interacts with the wavefront (per-block qstep
        in the predictors' quantize) — round-trip must hold."""
        from elvis_tpu.codec.nvc import codec as C

        n, h, w = tiny_video.shape[:3]
        by, bx = h // 8, w // 8
        roi = np.zeros((n, by, bx), np.int32)
        roi[:, :, : bx // 2] = -6
        s = C.encode(tiny_video, qp=40, gop=1, roi_delta_qp=roi)
        d, _ = C.decode(s)
        assert d.shape == tiny_video.shape
