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
