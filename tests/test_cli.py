"""CLI smoke tests (python -m gowebp_tpu …) — cwebp/dwebp parity surface."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = str(Path(__file__).resolve().parent.parent)


def _run(*argv):
    return subprocess.run(
        [sys.executable, "-m", "gowebp_tpu", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )


def test_encode_decode_info_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    webp = tmp_path / "out.webp"
    dst = tmp_path / "dec.png"
    Image.fromarray(arr).save(src)

    r = _run("encode", str(src), str(webp), "--quality", "80")
    assert r.returncode == 0, r.stderr
    assert webp.stat().st_size > 0

    r = _run("info", str(webp))
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout)
    assert (info["width"], info["height"]) == (56, 40)
    assert info["format"] == "lossy"

    r = _run("decode", str(webp), str(dst))
    assert r.returncode == 0, r.stderr
    out = np.asarray(Image.open(dst))
    assert out.shape[:2] == (40, 56)


def test_encode_lossless_bit_exact(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (24, 31, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    webp = tmp_path / "out.webp"
    dst = tmp_path / "dec.png"
    Image.fromarray(arr).save(src)
    assert _run("encode", str(src), str(webp), "--lossless").returncode == 0
    assert _run("decode", str(webp), str(dst)).returncode == 0
    out = np.asarray(Image.open(dst).convert("RGB"))
    np.testing.assert_array_equal(out, arr)
