"""gowebp_tpu — a TPU-native WebP codec in JAX/XLA/Pallas.

Built from scratch to cover the capability surface of libwebp (as
catalogued from the DaanV2/go-webp reference in SURVEY.md): VP8 lossy,
VP8L lossless, alpha, RIFF container, mux/demux, animation.

Design: dense pixel math (transforms, prediction, filtering, histograms)
runs on TPU as JAX/Pallas kernels; sequential entropy coding runs on the
host (Python reference path + native C++ fast path) over tensorized
symbol streams.
"""

from .decode import decode_rgb, decode_rgba, features

__version__ = "0.1.0"

__all__ = ["decode_rgba", "decode_rgb", "features", "__version__"]
