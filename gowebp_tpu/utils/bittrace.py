"""Per-syntax-class bit accounting for WebP streams (BITTRACE analog).

The reference keeps libwebp's bit-accounting plumbing (string labels on
every boolean-decoder read — bits_reader_vp8.go:159/177, vp8_dec.go
"coeffs"/"global-header" labels) but never reports it.  This module is
the working version: it decodes a stream once with the instrumented
pure-Python paths and reports how many bits each syntax class consumed
— ideal for debugging rate control and comparing encoders.

Usage::

    from gowebp_tpu.utils.bittrace import bit_accounting
    report = bit_accounting(webp_bytes)
    # {'format': 'lossy', 'total_bits': ..., 'classes': {...}, ...}
"""

from __future__ import annotations

from ..container.riff import parse_riff


def _trace_vp8(payload: bytes) -> dict:
    from ..models.vp8.decoder import decode_vp8_yuv

    trace: dict = {}
    decode_vp8_yuv(payload, trace=trace)
    classes = {
        "frame_header": trace["frame_header"],
        "intra_modes": trace["intra_modes"],
        "residuals": sum(trace["residuals"]),
    }
    return {
        "format": "lossy",
        "total_bits": 8 * len(payload),
        "classes": classes,
        "residuals_per_partition": trace["residuals"],
    }


def bit_accounting(data: bytes) -> dict:
    """Account the bits of a .webp file by syntax class.

    Lossy: frame_header / intra_modes / residuals (per token partition).
    Lossless: image_header / transforms / meta_huffman / huffman_codes /
    pixel_data.  Values are bits consumed by the decoder; the remainder
    up to ``total_bits`` is container overhead and byte padding.
    """
    parsed = parse_riff(data)
    vp8l = parsed.find(b"VP8L")
    vp8 = parsed.find(b"VP8 ")
    if vp8l is not None:
        from ..entropy.bitio import BitReader
        from ..models.vp8l import decoder as d

        width, height, _ = d.decode_vp8l_header(vp8l.payload)
        br = BitReader(vp8l.payload[1:])
        br.skip_bits(14 + 14 + 1 + 3)
        trace: dict = {}
        hdr = d._parse_stream_header(br, width, height, top_level=True,
                                     trace=trace)
        p0 = br.bit_pos
        d._decode_pixels(br, hdr.cur_xsize, height, hdr.groups,
                         hdr.huffman_image, hdr.huffman_bits,
                         hdr.cache_bits)
        classes = {
            "image_header": 8 + 32,   # signature byte + dims/alpha/version
            "transforms": trace["transforms"],
            "meta_huffman": trace["meta_huffman"],
            "huffman_codes": trace["huffman_codes"],
            "pixel_data": br.bit_pos - p0,
        }
        return {
            "format": "lossless",
            "total_bits": 8 * len(vp8l.payload),
            "classes": classes,
        }
    if vp8 is not None:
        return _trace_vp8(vp8.payload)
    raise ValueError("no VP8/VP8L image chunk to trace")


__all__ = ["bit_accounting"]
