"""Mux/demux/animation tests (Pillow as the interop oracle)."""

import io

import numpy as np
from PIL import Image

from gowebp_tpu.container.anim import AnimationEncoder, decode_animation
from gowebp_tpu.container.demux import demux
from gowebp_tpu.container.mux import Mux, MuxFrame


def _frames(n=3, size=(24, 32)):
    rng = np.random.default_rng(6)
    out = []
    for i in range(n):
        f = np.zeros(size + (4,), np.uint8)
        f[..., 0] = 40 * i + 20
        f[..., 1] = rng.integers(0, 255)
        f[..., 2] = 200 - 50 * i
        f[..., 3] = 255
        out.append(f)
    return out


def _pil_animation(frames, durations):
    imgs = [Image.fromarray(f) for f in frames]
    buf = io.BytesIO()
    imgs[0].save(
        buf, "WEBP", save_all=True, append_images=imgs[1:],
        duration=durations, lossless=True, exact=True, loop=2,
    )
    return buf.getvalue()


class TestDemux:
    def test_pillow_animation_roundtrip(self):
        frames = _frames()
        data = _pil_animation(frames, [100, 200, 300])
        d = demux(data)
        assert d.num_frames == 3
        assert d.has_animation
        assert d.loop_count == 2
        assert [f.duration_ms for f in d.frames] == [100, 200, 300]
        decoded, _ = decode_animation(data)
        for ours, orig in zip(decoded, frames):
            np.testing.assert_array_equal(ours.rgba, orig)

    def test_simple_file_demux(self):
        img = _frames(1)[0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", lossless=True, exact=True)
        d = demux(buf.getvalue())
        assert d.num_frames == 1
        assert (d.canvas_width, d.canvas_height) == (32, 24)


class TestMux:
    def test_animation_encode_pillow_reads(self):
        frames = _frames(4)
        enc = AnimationEncoder(loop_count=1)
        for i, f in enumerate(frames):
            enc.add_frame(f, duration_ms=50 * (i + 1), lossless=True)
        data = enc.assemble()

        img = Image.open(io.BytesIO(data))
        assert getattr(img, "n_frames", 1) == 4
        for i, orig in enumerate(frames):
            img.seek(i)
            np.testing.assert_array_equal(np.asarray(img.convert("RGBA")), orig)

        # And our own decoder agrees.
        decoded, d = decode_animation(data)
        assert d.loop_count == 1
        for ours, orig in zip(decoded, frames):
            np.testing.assert_array_equal(ours.rgba, orig)

    def test_metadata_chunks(self):
        img = _frames(1)[0]
        from gowebp_tpu.encode import encode_rgba
        from gowebp_tpu.container.riff import parse_riff

        payload = parse_riff(encode_rgba(img, lossless=True)).find(b"VP8L").payload
        m = Mux()
        m.set_image(payload, is_lossless=True)
        m.exif = b"Exif\x00\x00fake"
        m.xmp = b"<xmp/>"
        data = m.assemble()
        d = demux(data)
        assert d.exif == b"Exif\x00\x00fake"
        assert d.xmp == b"<xmp/>"
        # Pillow still decodes the pixels.
        got = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
        np.testing.assert_array_equal(got, img)


class TestDeltaFrames:
    def test_delta_optimization(self):
        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, (40, 64, 4), dtype=np.uint8)
        base[..., 3] = 255
        f2 = base.copy()
        f2[10:20, 30:44] = (255, 0, 0, 255)
        frames = [base, f2, f2.copy(), f2.copy()]
        f3 = f2.copy()
        f3[0:4, 0:8] = (0, 255, 0, 255)
        frames.append(f3)

        enc = AnimationEncoder()
        for f in frames:
            enc.add_frame(f, 100, lossless=True)
        data = enc.assemble()

        img = Image.open(io.BytesIO(data))
        assert img.n_frames == 3  # two identical frames merged
        expect = [frames[0], f2, f3]
        for i, e in enumerate(expect):
            img.seek(i)
            np.testing.assert_array_equal(np.asarray(img.convert("RGBA")), e)
        # Merged duration shows up on the middle frame.
        _, d = decode_animation(data)
        assert [fr.duration_ms for fr in d.frames] == [100, 300, 100]

        enc_full = AnimationEncoder(minimize_size=False)
        for f in frames:
            enc_full.add_frame(f, 100, lossless=True)
        assert len(data) < len(enc_full.assemble()) // 2


def test_allow_mixed_candidates():
    """allow_mixed tries lossy+lossless per sub-frame, keeps the smaller;
    the result must composite identically in Pillow and our decoder."""
    import io
    from PIL import Image

    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (64, 96, 4), dtype=np.uint8)
    base[..., 3] = 255
    frames = []
    for i in range(5):
        f = base.copy()
        f[10 + i * 5 : 20 + i * 5, 30:60, :3] = rng.integers(0, 256, 3)
        frames.append(f)

    enc = AnimationEncoder(allow_mixed=True)
    for f in frames:
        enc.add_frame(f, 100, quality=80)
    data = enc.assemble()
    out, _ = decode_animation(data)
    assert len(out) == 5
    im = Image.open(io.BytesIO(data))
    assert im.n_frames == 5
    for i in range(5):
        im.seek(i)
        ours = out[i][0] if isinstance(out[i], tuple) else out[i].rgba
        np.testing.assert_array_equal(
            np.asarray(im.convert("RGBA")), ours)


class TestMuxEditing:
    """WebPMuxSetChunk/GetChunk/DeleteChunk, anim params, from_bytes."""

    def test_chunk_api_and_from_bytes(self):
        frames = _frames()
        data = _pil_animation(frames, [100, 100, 100])
        m = Mux.from_bytes(data)
        assert len(m.frames) == 3 and m.loop_count == 2

        m.set_chunk("EXIF", b"exif-bytes")
        m.set_chunk(b"XMP ", b"<xmp/>")
        m.set_chunk("ABCD", b"custom-payload")
        m.set_animation_params(loop_count=7, background_color=0x80FF0000)
        out = m.assemble()

        d = demux(out)
        assert d.exif == b"exif-bytes"
        assert d.xmp == b"<xmp/>"
        assert d.loop_count == 7
        assert d.background_color == 0x80FF0000
        assert [c.payload for c in d.unknown_chunks
                if c.tag == b"ABCD"] == [b"custom-payload"]
        # Frames survive the round trip bit-for-bit.
        orig = demux(data)
        for a, b in zip(orig.frames, d.frames):
            assert a.image_payload == b.image_payload

        m2 = Mux.from_bytes(out)
        assert m2.get_chunk("ABCD") == b"custom-payload"
        m2.delete_chunk("ABCD")
        m2.delete_chunk("EXIF")
        assert m2.get_chunk("ABCD") is None
        d2 = demux(m2.assemble())
        assert d2.exif is None and not d2.unknown_chunks

    def test_set_canvas_size_validates(self):
        import pytest

        frames = _frames()
        m = Mux.from_bytes(_pil_animation(frames, [100, 100, 100]))
        from gowebp_tpu.errors import WebPError
        with pytest.raises(WebPError):
            m.set_canvas_size(8, 8)
        m.set_canvas_size(64, 48)
        d = demux(m.assemble())
        assert (d.canvas_width, d.canvas_height) == (64, 48)


class TestPartialDemux:
    def test_truncated_animation(self):
        import pytest

        frames = _frames(4)
        data = _pil_animation(frames, [100] * 4)
        cut = data[: int(len(data) * 0.6)]
        from gowebp_tpu.errors import NotEnoughData
        with pytest.raises(NotEnoughData):
            demux(cut)
        d = demux(cut, partial=True)
        assert d.is_partial
        assert 1 <= d.num_frames < 4
        # Every returned frame is fully decodable.
        out, _ = decode_animation_partial_ok(cut)
        assert len(out) == d.num_frames


def decode_animation_partial_ok(data):
    from gowebp_tpu.container.anim import AnimFrame, _blend_nonpremult, _decode_frame_rgba

    d = demux(data, partial=True)
    W, H = d.canvas_width, d.canvas_height
    canvas = np.zeros((H, W, 4), np.uint8)
    out = []
    for f in d.frames:
        rgba = _decode_frame_rgba(f)
        fh, fw = rgba.shape[:2]
        region = canvas[f.y : f.y + fh, f.x : f.x + fw]
        region[:] = _blend_nonpremult(rgba, region) if f.blend else rgba
        out.append(AnimFrame(canvas.copy(), f.duration_ms))
    return out, d


class TestKeyframesAndBlanking:
    def test_kmax_forces_keyframes(self):
        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, (40, 64, 4), dtype=np.uint8)
        base[..., 3] = 255
        frames = [base]
        for i in range(7):
            f = frames[-1].copy()
            f[4 * i : 4 * i + 4, 8 : 16] = (i * 30, 255 - i * 30, 0, 255)
            frames.append(f)

        enc = AnimationEncoder(kmax=3, kmin=1)
        for f in frames:
            enc.add_frame(f, 50, lossless=True)
        data = enc.assemble()
        d = demux(data)
        # Forced keyframes: full-canvas frames at (0,0) with no blending
        # appear at least every 3 frames.
        full = [
            (f.x, f.y) == (0, 0)
            and (f.width, f.height) == (d.canvas_width, d.canvas_height)
            and not f.blend
            for f in d.frames
        ]
        run = 0
        for is_key in full:
            run = 0 if is_key else run + 1
            assert run < 3
        # Output still composites exactly.
        out, _ = decode_animation(data)
        for got, want in zip(out, frames):
            np.testing.assert_array_equal(got.rgba, want)

    def test_dispose_background_candidate_erases_cheaply(self):
        """A frame that erases content (alpha drops to 0 over a large
        area) should flip the previous frame's dispose method to
        BACKGROUND (the reference's 4-way candidate search) — and stay
        pixel-exact through both our decoder and Pillow."""
        W = H = 64
        f0 = np.zeros((H, W, 4), np.uint8)          # transparent canvas
        f1 = f0.copy()
        rng = np.random.default_rng(5)
        f1[8:56, 8:56] = np.concatenate(
            [rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),
             np.full((48, 48, 1), 255, np.uint8)], axis=-1)  # big sprite
        f2 = f0.copy()
        f2[10:18, 10:18] = (0, 255, 0, 255)          # sprite mostly gone
        enc = AnimationEncoder()
        enc.add_frame(f0, 50, lossless=True)
        enc.add_frame(f1, 50, lossless=True)
        enc.add_frame(f2, 50, lossless=True)
        data = enc.assemble()
        out, d = decode_animation(data)
        np.testing.assert_array_equal(out[0].rgba, f0)
        np.testing.assert_array_equal(out[1].rgba, f1)
        np.testing.assert_array_equal(out[2].rgba, f2)
        # Erasure is only expressible via dispose-to-background.
        assert d.frames[1].dispose_background

        import io as _io
        from PIL import Image as _Image
        im = _Image.open(_io.BytesIO(data))
        im.seek(2)
        np.testing.assert_array_equal(np.asarray(im.convert("RGBA")), f2)

    def test_blanking_candidate_shrinks_and_is_exact(self):
        rng = np.random.default_rng(12)
        base = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
        base[..., 3] = 255
        f2 = base.copy()
        # Sparse scattered change inside a large rect: blanking should win.
        for i in range(6):
            f2[8 * (i % 5) + 2, 10 * i + 1] = (255, 0, 0, 255)
        enc = AnimationEncoder()
        enc.add_frame(base, 100, lossless=True)
        enc.add_frame(f2, 100, lossless=True)
        data = enc.assemble()
        out, d = decode_animation(data)
        np.testing.assert_array_equal(out[0].rgba, base)
        np.testing.assert_array_equal(out[1].rgba, f2)
        # The second frame used blend compositing (blanked candidate).
        assert d.frames[1].blend

        import io as _io
        from PIL import Image as _Image
        im = _Image.open(_io.BytesIO(data))
        im.seek(1)
        np.testing.assert_array_equal(np.asarray(im.convert("RGBA")), f2)
